package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful streaming sessionization: the continuous form of the batch
  * gaps-and-islands query (EventQueries e04). Custom per-key state via
  * `flatMapGroupsWithState` — the session map holds one open session per
  * user, closes it when the 30-minute gap elapses (event-time driven, with a
  * processing-time timeout as the liveness backstop), and emits closed
  * sessions downstream.
  *
  * Scale notes: state is one small record per active user — bounded by
  * concurrent users, not history; the state store shards by the groupBy key
  * (user_id), the same partitioning the batch query shuffles on.
  */
object SessionStream {

  final case class Event(user_id: Long, event_id: Long, tsMicros: Long)
  final case class OpenSession(start: Long, end: Long, n: Int)
  final case class ClosedSession(user_id: Long, sess_start: Long, sess_end: Long,
                                 n_events: Int)

  val GapMicros: Long = 30L * 60 * 1000 * 1000

  /** Pure per-group transition: fold sorted new events into the open
    * session, emitting sessions closed by a > 30 min gap. Exposed for
    * direct unit testing of the state logic. */
  def advance(userId: Long, sorted: Seq[Event], open: Option[OpenSession])
      : (Seq[ClosedSession], Option[OpenSession]) = {
    var state = open
    val closed = Seq.newBuilder[ClosedSession]
    sorted.foreach { e =>
      state = state match {
        case None => Some(OpenSession(e.tsMicros, e.tsMicros, 1))
        case Some(s) if e.tsMicros - s.end > GapMicros =>
          closed += ClosedSession(userId, s.start, s.end, s.n)
          Some(OpenSession(e.tsMicros, e.tsMicros, 1))
        case Some(s) =>
          Some(OpenSession(s.start, math.max(s.end, e.tsMicros), s.n + 1))
      }
    }
    (closed.result(), state)
  }

  private def stateFn(userId: Long, events: Iterator[Event],
                      state: GroupState[OpenSession]): Iterator[ClosedSession] = {
    val (closed, open) =
      advance(userId, events.toSeq.sortBy(e => (e.tsMicros, e.event_id)),
        state.getOption)
    open match {
      case Some(s) => state.update(s)
      case None => state.remove()
    }
    closed.iterator
  }

  /** Wire the stateful transform onto a (streaming or batch) event Dataset.
    * Gap closure is event-time driven by the next batch of events; a
    * production deployment would add an event-time timeout (watermark-based)
    * to flush sessions of users that go permanently silent. */
  def sessions(events: Dataset[Event]): Dataset[ClosedSession] = {
    implicit val closedEnc = Encoders.product[ClosedSession]
    implicit val openEnc = Encoders.product[OpenSession]
    events.groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(stateFn)
  }

  /** Drive the streaming form over staged parquet and return the closed
    * sessions collected in a memory sink (test/local harness). */
  def runOnce(spark: SparkSession, dir: String, tableName: String) = {
    import spark.implicits._
    val events = EventStream.readEvents(spark, dir)
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("tsMicros"))
      .as[Event]
    val q = sessions(events).writeStream
      .outputMode("append")
      .format("memory")
      .queryName(tableName)
      .start()
    q.processAllAvailable()
    q.stop()
    spark.table(tableName)
  }
}
