package graft.streaming

import java.nio.file.{Files, Paths, StandardCopyOption}
import graft.SparkSpec
import org.apache.spark.sql.functions._

/** FunnelStream must equal the batch e11 semantics on the real event
  * corpus — exactly, when arrival respects timestamp order (one batch, or
  * a ts-ordered two-batch split) — and its fold must enforce the strict
  * ordering rules (no click before a view, strict > at stage borders). */
class FunnelStreamSpec extends SparkSpec {

  /** batch reference: per-user (stage, ts_us, delay_us) via the same
    * relational construction as the e11 gate */
  private def batchStages(dir: String): Set[(Long, Int, Long, Long)] = {
    val ev = graft.core.Tables.events(spark, dir)
    val v = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(unix_micros(col("ts"))).as("tv"))
    val c = ev.filter(col("event_type") === "click")
      .join(v, Seq("user_id"))
      .filter(unix_micros(col("ts")) > col("tv"))
      .groupBy(col("user_id"), col("tv"))
      .agg(min(unix_micros(col("ts"))).as("tc"))
    val p = ev.filter(col("event_type") === "purchase")
      .join(c.select(col("user_id"), col("tv"), col("tc")), Seq("user_id"))
      .filter(unix_micros(col("ts")) > col("tc"))
      .groupBy(col("user_id"), col("tc"))
      .agg(min(unix_micros(col("ts"))).as("tb"))
    val s1 = v.collect().map(r => (r.getLong(0), 1, r.getLong(1), 0L))
    val s2 = c.collect().map(r => (r.getLong(0), 2, r.getLong(2),
      r.getLong(2) - r.getLong(1)))
    val s3 = p.collect().map(r => (r.getLong(0), 3, r.getLong(2),
      r.getLong(2) - r.getLong(1)))
    (s1 ++ s2 ++ s3).toSet
  }

  private def hits(table: String): Set[(Long, Int, Long, Long)] =
    spark.table(table).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSet

  test("single-batch streaming funnel equals the batch construction") {
    val dir = Files.createTempDirectory("funnel_stream")
    Files.copy(Paths.get(s"$sfSmoke/events.parquet"),
      dir.resolve("events.parquet"), StandardCopyOption.REPLACE_EXISTING)
    val got = FunnelStream.runOnce(spark, dir.toString, "funnel_one")
    val streamed = hits("funnel_one")
    val want = batchStages(dir.toString)
    assert(streamed == want)
    assert(want.exists(_._2 == 3), "no stage-3 conversions — weak fixture")
    assert(got.count() == want.size)
  }

  test("ts-ordered two-batch split emits the same stage hits incrementally") {
    val dir = Files.createTempDirectory("funnel_split")
    val ev = graft.core.Tables.events(spark, sfSmoke)
    val cut = ev.selectExpr("percentile(unix_micros(ts), 0.5)").head().getDouble(0).toLong
    writeBatch(dir, "b1", ev.filter(unix_micros(col("ts")) <= cut))
    val q = FunnelStream.stageHits(spark, dir.toString).toDF().writeStream
      .outputMode("append").format("memory").queryName("funnel_two").start()
    try {
      q.processAllAvailable()
      val afterB1 = hits("funnel_two")
      writeBatch(dir, "b2", ev.filter(unix_micros(col("ts")) > cut))
      q.processAllAvailable()
      val all = hits("funnel_two")
      assert(afterB1.subsetOf(all), "append-mode emissions must accumulate")
      assert(all == batchStages(sfSmoke),
        "ts-ordered split must equal the batch semantics")
    } finally q.stop()
  }

  /** write `rows` (Tables.events projection) as one parquet batch file
    * into the stream dir */
  private def writeBatch(dir: java.nio.file.Path, name: String,
                         rows: org.apache.spark.sql.DataFrame): Unit = {
    val tmp = Files.createTempDirectory(s"funnel_b_$name")
    rows.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val part = Files.list(tmp).toArray.map(_.toString)
      .filter(_.endsWith(".parquet")).head
    Files.copy(Paths.get(part), dir.resolve(s"$name.parquet"),
      StandardCopyOption.REPLACE_EXISTING)
  }

  /** a one-row sentinel batch for a dummy user at `tsUs`: pushes the
    * watermark so held real events ripen (append-mode event-time streams
    * flush on watermark advancement, not on stream end) */
  private def sentinel(dir: java.nio.file.Path, name: String, tsUs: Long): Unit = {
    val ev = graft.core.Tables.events(spark, sfSmoke).limit(1)
      .withColumn("user_id", lit(-1L))
      .withColumn("ts", timestamp_micros(lit(tsUs)))
    writeBatch(dir, name, ev)
  }

  for (seed <- Seq(7, 23))
    test(s"stageHitsExact equals batch semantics under random arrival (seed $seed)") {
      // shuffle the corpus into 3 batches with NO regard for ts order —
      // the regime where the prefix-exact fold diverges (round-8 verdict
      // item 2); with delay >= the corpus ts span nothing is
      // watermark-late, so the exact variant must reproduce batch e11
      // semantics bit-for-bit once the sentinel advances the watermark
      val dir = Files.createTempDirectory(s"funnel_ooo_$seed")
      val ev = graft.core.Tables.events(spark, sfSmoke)
      val b = ev.withColumn("__b",
        pmod(hash(col("event_id"), lit(seed)), lit(3)))
      val (lo, hi) = {
        val r = ev.agg(min(unix_micros(col("ts"))), max(unix_micros(col("ts")))).head()
        (r.getLong(0), r.getLong(1))
      }
      val delaySec = (hi - lo) / 1000000L + 60L
      val q = FunnelStream.stageHitsExact(spark, dir.toString, s"$delaySec seconds")
        .toDF().writeStream
        .outputMode("append").format("memory").queryName(s"funnel_ooo_$seed").start()
      try {
        (0 until 3).foreach { i =>
          writeBatch(dir, s"b$i", b.filter(col("__b") === i).drop("__b"))
          q.processAllAvailable()
        }
        // two sentinels: the first advances the watermark past every real
        // event; the second triggers the batch in which their timeouts fire
        sentinel(dir, "s1", hi + 2 * delaySec * 1000000L)
        q.processAllAvailable()
        sentinel(dir, "s2", hi + 4 * delaySec * 1000000L)
        q.processAllAvailable()
        val got = hits(s"funnel_ooo_$seed").filter(_._1 >= 0)
        assert(got == batchStages(sfSmoke),
          "randomized arrival must converge to the batch semantics")
      } finally q.stop()
    }

  test("stageHitsExact emits incrementally once the watermark ripens events") {
    // ts-ordered halves with a small delay: most of batch 1 must emit as
    // soon as batch 2's max event time pushes the watermark past it — the
    // ripe-prefix path, not just the final flush
    val dir = Files.createTempDirectory("funnel_exact_inc")
    val ev = graft.core.Tables.events(spark, sfSmoke)
    val cut = ev.selectExpr("percentile(unix_micros(ts), 0.5)").head().getDouble(0).toLong
    val hi = ev.agg(max(unix_micros(col("ts")))).head().getLong(0)
    val q = FunnelStream.stageHitsExact(spark, dir.toString, "1 second")
      .toDF().writeStream
      .outputMode("append").format("memory").queryName("funnel_exact_inc").start()
    try {
      writeBatch(dir, "b1", ev.filter(unix_micros(col("ts")) <= cut))
      q.processAllAvailable()
      writeBatch(dir, "b2", ev.filter(unix_micros(col("ts")) > cut))
      q.processAllAvailable()
      val mid = hits("funnel_exact_inc").filter(_._1 >= 0)
      assert(mid.nonEmpty, "nothing emitted before the flush — ripe path dead")
      sentinel(dir, "s1", hi + 10000000L)
      q.processAllAvailable()
      sentinel(dir, "s2", hi + 20000000L)
      q.processAllAvailable()
      val all = hits("funnel_exact_inc").filter(_._1 >= 0)
      assert(mid.subsetOf(all), "append-mode emissions must accumulate")
      assert(all == batchStages(sfSmoke))
    } finally q.stop()
  }

  test("advance enforces strict funnel ordering") {
    import FunnelStream.{FunnelState, advance}
    val empty = FunnelState(None, None, None)
    // click before any view: ignored
    assert(advance(empty, "click", 100L)._2.isEmpty)
    // purchase before any click: ignored
    assert(advance(empty, "purchase", 100L)._2.isEmpty)
    val (afterView, h1) = advance(empty, "view", 100L)
    assert(h1.exists(_.stage == 1))
    // click at EXACTLY the view timestamp: strict > rejects it
    assert(advance(afterView, "click", 100L)._2.isEmpty)
    val (afterClick, h2) = advance(afterView, "click", 150L)
    assert(h2.exists(h => h.stage == 2 && h.delay_us == 50L))
    // second click: first one wins, no re-emission
    assert(advance(afterClick, "click", 160L)._2.isEmpty)
    // purchase at exactly the click ts: rejected; later: stage 3
    assert(advance(afterClick, "purchase", 150L)._2.isEmpty)
    val (_, h3) = advance(afterClick, "purchase", 250L)
    assert(h3.exists(h => h.stage == 3 && h.delay_us == 100L))
    // an earlier view arriving later cannot displace the first view
    assert(advance(afterClick, "view", 50L)._2.isEmpty)
  }
}
