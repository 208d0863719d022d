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
