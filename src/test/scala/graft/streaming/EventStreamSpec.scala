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

    // batch equivalent: identical predicate over the static table
    val ev = spark.read.schema(EventStream.rawSchema)
      .parquet(dir.toString)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
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
