package graft.streaming

import java.nio.file.{Files, Paths, StandardCopyOption}
import graft.SparkSpec
import graft.SparkEntry

class EventStreamSpec extends SparkSpec {

  test("streaming hourly rollup matches the batch e02 result") {
    // the file stream source globs a whole directory, so stage events.parquet
    // alone (the sf dir holds every table)
    val dir = Files.createTempDirectory("events_stream")
    Files.copy(Paths.get(s"$sfSmoke/events.parquet"),
      dir.resolve("events.parquet"), StandardCopyOption.REPLACE_EXISTING)

    val streamed = EventStream.runOnce(spark, dir.toString, "ev_hourly")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2),
        r.getDouble(3))).toSet
    val batch = SparkEntry.queries("e02_hourly_rollup")(spark, sfSmoke)
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2),
        r.getDouble(3))).toSet
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("stream-stream interval join matches the batch join") {
    import org.apache.spark.sql.functions._
    val dir = Files.createTempDirectory("events_attr_stream")
    Files.copy(Paths.get(s"$sfSmoke/events.parquet"),
      dir.resolve("events.parquet"), StandardCopyOption.REPLACE_EXISTING)

    val streamed = EventStream.runAttributionOnce(spark, dir.toString, "ev_attr")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    // batch equivalent: identical predicate over the static table (the
    // staged dir holds a file literally named events.parquet, so the
    // central loader's $dir/events.parquet path resolves to it)
    val ev = graft.core.Tables.events(spark, dir.toString)
    def side(t: String, p: String) = ev.filter(col("event_type") === t)
      .select(col("event_id").as(s"${p}_id"), col("user_id").as(s"${p}_user"),
        col("ts").as(s"${p}_ts"))
    val batch = side("purchase", "p").join(side("click", "c"),
        col("p_user") === col("c_user") &&
          col("c_ts") <= col("p_ts") &&
          col("c_ts") >= col("p_ts") - expr("INTERVAL 30 MINUTES"))
      .select(col("p_id"), col("c_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("outer stream-stream join emits the unmatched purchase only after the watermark") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val dir = Files.createTempDirectory("outer_attr_stream")
    def addBatch(name: String,
                 rows: Seq[(Long, Long, Long, String, Double, String)]): Unit = {
      val stage = Files.createTempDirectory(s"stage_$name")
      rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1).write.mode("overwrite").parquet(stage.toString)
      val part = java.nio.file.Files.list(stage).toArray.map(_.toString)
        .filter(_.endsWith(".parquet")).head
      Files.copy(Paths.get(part), dir.resolve(s"$name.parquet"),
        StandardCopyOption.REPLACE_EXISTING)
    }
    val base = 1704103200L // 2024-01-01T10:00:00Z
    def nanos(offsetMin: Long): Long = (base + offsetMin * 60) * 1000000000L
    // batch 1: user 1 purchase WITH a click in-window; user 2 purchase
    // with NO click — the outer row cannot emit yet (a matching click
    // could still arrive inside the watermark delay)
    addBatch("b1", Seq(
      (1L, nanos(-10), 1L, "click", 0.0, "{}"),
      (2L, nanos(0), 1L, "purchase", 10.0, "{}"),
      (3L, nanos(5), 2L, "purchase", 20.0, "{}")))
    val q = EventStream.clickAttributionOuter(spark, dir.toString)
      .writeStream.outputMode("append").format("memory")
      .queryName("outer_attr").start()
    try {
      q.processAllAvailable()
      val afterB1 = spark.table("outer_attr")
        .select(col("p_id"), col("c_id")).collect()
        .map(r => (r.getLong(0), Option(r.get(1)))).toSet
      assert(afterB1 == Set((2L, Some(1L))),
        s"only the matched pair may emit before the watermark: $afterB1")
      // batch 2: far-future rows on BOTH sides push the global watermark
      // (min across inputs) past user 2's join window → state eviction
      // emits the null-padded row
      addBatch("b2", Seq(
        (8L, nanos(400), 9L, "click", 0.0, "{}"),
        (9L, nanos(400), 9L, "purchase", 0.0, "{}")))
      q.processAllAvailable()
      // one more empty-ish batch lets the new watermark act on state
      addBatch("b3", Seq((10L, nanos(401), 8L, "click", 0.0, "{}")))
      q.processAllAvailable()
    } finally q.stop()
    val out = spark.table("outer_attr")
      .select(col("p_id"), col("c_id")).collect()
      .map(r => (r.getLong(0), Option(r.get(1)))).toSet
    assert(out.contains((2L, Some(1L))), s"matched pair missing: $out")
    assert(out.contains((3L, None)), s"unmatched purchase never emitted: $out")
    // the matched purchase must NOT also emit a null-padded twin
    assert(!out.contains((2L, None)), s"outer join double-emitted: $out")
  }

  test("append-mode watermark finalizes windows and drops late rows") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val dir = Files.createTempDirectory("late_stream")
    // write one staged parquet FILE per micro-batch into the watched dir
    def addBatch(name: String,
                 rows: Seq[(Long, Long, Long, String, Double, String)]): Unit = {
      val stage = Files.createTempDirectory(s"stage_$name")
      rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1).write.mode("overwrite").parquet(stage.toString)
      val part = java.nio.file.Files.list(stage).toArray.map(_.toString)
        .filter(_.endsWith(".parquet")).head
      Files.copy(Paths.get(part), dir.resolve(s"$name.parquet"),
        StandardCopyOption.REPLACE_EXISTING)
    }
    val base = 1704103200L // 2024-01-01T10:00:00Z, epoch seconds
    def nanos(offsetMin: Long): Long = (base + offsetMin * 60) * 1000000000L

    // batch 1: three purchases inside [10:00, 11:00) + one at 13:30 that
    // advances the watermark to 11:30 AFTER the batch
    addBatch("b1", Seq(
      (1L, nanos(0), 1L, "purchase", 10.0, "{}"),
      (2L, nanos(10), 2L, "purchase", 10.0, "{}"),
      (3L, nanos(20), 3L, "purchase", 10.0, "{}"),
      (4L, nanos(210), 4L, "purchase", 10.0, "{}")))

    val q = EventStream.hourlyRollup(spark, dir.toString)
      .writeStream.outputMode("append").format("memory")
      .queryName("late_rollup").start()
    try {
      q.processAllAvailable()
      // batch 2: a LATE purchase at 10:15 (before the 11:30 watermark —
      // its window is already finalized, so it must be dropped) plus an
      // on-time row pushing the watermark past 13:30's window
      addBatch("b2", Seq(
        (5L, nanos(15), 5L, "purchase", 99.0, "{}"),
        (6L, nanos(420), 6L, "purchase", 10.0, "{}")))
      q.processAllAvailable()
    } finally q.stop()

    val out = spark.table("late_rollup")
      .select(col("hour").cast("long"), col("event_type"), col("n"),
        col("total_value"))
      .as[(Long, String, Long, Double)].collect()
      .map(r => r._1 -> ((r._3, r._4))).toMap
    // the 10:00 window finalized with the three ON-TIME rows; the late
    // event 5 (value 99.0) is not in it
    assert(out(base) == ((3L, 30.0)), s"10:00 window wrong: ${out.get(base)}")
    // the 13:00 window finalized once the watermark passed it
    assert(out(base + 3 * 3600) == ((1L, 10.0)))
  }

  test("foreachBatch warehouse sink converges to the batch rollup across micro-batches") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val dir = Files.createTempDirectory("wh_stream")
    val wh = Files.createTempDirectory("wh_out").toString
    def addBatch(name: String,
                 rows: Seq[(Long, Long, Long, String, Double, String)]): Unit = {
      val stage = Files.createTempDirectory(s"whstage_$name")
      rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1).write.mode("overwrite").parquet(stage.toString)
      val part = java.nio.file.Files.list(stage).toArray.map(_.toString)
        .filter(_.endsWith(".parquet")).head
      Files.copy(Paths.get(part), dir.resolve(s"$name.parquet"),
        StandardCopyOption.REPLACE_EXISTING)
    }
    val base = 1704103200L // 2024-01-01T10:00:00Z
    def nanos(offsetMin: Long): Long = (base + offsetMin * 60) * 1000000000L

    addBatch("b1", Seq(
      (1L, nanos(0), 1L, "purchase", 10.0, "{}"),
      (2L, nanos(10), 2L, "click", 1.0, "{}")))
    val q = EventStream.rollupToWarehouse(spark, dir.toString, wh)
    try {
      q.processAllAvailable()
      // second batch UPDATES hour 10:00's purchase rollup (in-watermark)
      // and adds a new hour — the changed partition must be overwritten
      // idempotently, the click partition left alone
      addBatch("b2", Seq(
        (3L, nanos(30), 3L, "purchase", 5.0, "{}"),
        (4L, nanos(70), 4L, "click", 2.0, "{}")))
      q.processAllAvailable()
    } finally q.stop()

    val got = spark.read.parquet(wh)
      .select(col("hour_key"), col("event_type"), col("n"), col("total_value"))
      .as[(String, String, Long, Double)].collect().toSet
    assert(got == Set(
      ("2024-01-01-10", "purchase", 2L, 15.0), // updated, not duplicated
      ("2024-01-01-10", "click", 1L, 1.0), // untouched by batch 2
      ("2024-01-01-11", "click", 1L, 2.0)))
  }

  test("streaming dedup-keep-first matches the batch e03 result") {
    val dir = Files.createTempDirectory("events_dedup_stream")
    Files.copy(Paths.get(s"$sfSmoke/events.parquet"),
      dir.resolve("events.parquet"), StandardCopyOption.REPLACE_EXISTING)

    val streamed = EventStream.runDedupOnce(spark, dir.toString, "ev_dedup")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getTimestamp(3))).toSet
    val batch = SparkEntry.queries("e03_dedup_first")(spark, sfSmoke)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getTimestamp(3))).toSet
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }
}
