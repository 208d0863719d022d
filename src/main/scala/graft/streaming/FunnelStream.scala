package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Ordered-funnel tracking AT INGEST — the streaming twin of the batch
  * e11 query: per user, the first view, the first click strictly AFTER
  * that view, and the first purchase strictly AFTER that click, each stage
  * transition emitted the moment its event arrives instead of overnight.
  *
  * State per user is three optional microsecond timestamps — O(1), no
  * event retention, no watermark-sized buffers; the state a conversion
  * dashboard actually needs.
  *
  * Ordering contract (pinned in FunnelStreamSpec): within a microbatch a
  * user's events are processed in `ts` order (late data inside a batch is
  * handled exactly); ACROSS batches the fold is prefix-monotone — it
  * equals the batch e11 semantics whenever each user's events arrive in
  * timestamp order across batches (the file-source / watermark regime).
  * A cross-batch regression (e.g. a view older than an already-consumed
  * click arriving a batch late) cannot retroactively lower `t_click`
  * without retaining every click seen, which is the explicit trade: O(1)
  * state, prefix-exact semantics — NearDupStream's capped-bucket contract,
  * same shape. The batch e11 gate remains the full-corpus truth.
  */
object FunnelStream {

  /** (t_view, t_click, t_buy) in microseconds; None = stage not reached. */
  case class FunnelState(tView: Option[Long], tClick: Option[Long],
                         tBuy: Option[Long])

  /** One emitted stage transition: stage 1 = first view, 2 = first
    * qualifying click (delay vs view), 3 = first qualifying purchase
    * (delay vs click). */
  case class StageHit(user_id: Long, stage: Int, ts_us: Long, delay_us: Long)

  /** The per-user fold over ts-sorted events — shared by the streaming
    * query and the spec's sequential reference. */
  private[streaming] def advance(st: FunnelState,
                                 eventType: String, tsUs: Long)
      : (FunnelState, Option[StageHit]) = eventType match {
    case "view" if st.tView.isEmpty =>
      val s = st.copy(tView = Some(tsUs))
      (s, Some(StageHit(0L, 1, tsUs, 0L))) // user filled by caller
    case "click" if st.tView.nonEmpty && st.tClick.isEmpty &&
        tsUs > st.tView.get =>
      (st.copy(tClick = Some(tsUs)),
        Some(StageHit(0L, 2, tsUs, tsUs - st.tView.get)))
    case "purchase" if st.tClick.nonEmpty && st.tBuy.isEmpty &&
        tsUs > st.tClick.get =>
      (st.copy(tBuy = Some(tsUs)),
        Some(StageHit(0L, 3, tsUs, tsUs - st.tClick.get)))
    case _ => (st, None)
  }

  /** Streaming stage transitions over a growing event directory. */
  def stageHits(spark: SparkSession, dir: String): Dataset[StageHit] = {
    import spark.implicits._
    EventStream.readEvents(spark, dir)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("ts_us"))
      .as[(Long, String, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (user: Long, events: Iterator[(Long, String, Long)],
         state: GroupState[FunnelState]) => {
          var st = state.getOption.getOrElse(FunnelState(None, None, None))
          val out = scala.collection.mutable.ArrayBuffer[StageHit]()
          events.toSeq.sortBy(e => (e._3, e._2)).foreach { case (_, et, ts) =>
            val (next, hit) = advance(st, et, ts)
            st = next
            hit.foreach(h => out += h.copy(user_id = user))
          }
          state.update(st)
          out.iterator
        })
  }

  /** Test/local harness: drive over existing files, return the collected
    * stage hits. */
  def runOnce(spark: SparkSession, dir: String, tableName: String): DataFrame = {
    val q = stageHits(spark, dir).toDF().writeStream
      .outputMode("append").format("memory").queryName(tableName).start()
    q.processAllAvailable()
    q.stop()
    spark.table(tableName)
  }
}
