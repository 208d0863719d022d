package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

class ManifestSpec extends SparkSpec {
  import spark.implicits._

  private def filesRead(df: org.apache.spark.sql.DataFrame): Long = {
    df.collect()
    df.queryExecution.executedPlan.collect {
      case f: FileSourceScanExec => f
    }.map(_.metrics("numFiles").value).sum
  }

  test("manifest pruning reads only intersecting files and keeps the exact answer") {
    val dir = java.nio.file.Files.createTempDirectory("manifest").toString
    // 16 files, each covering a disjoint key range (the clustered-write shape)
    spark.range(160000L).select(col("id").as("k"), (col("id") % 7).as("v"))
      .repartitionByRange(16, col("k")).sortWithinPartitions(col("k"))
      .write.mode("overwrite").parquet(dir)
    Manifest.write(spark, dir, Seq("k"))

    // manifest dir is _-prefixed: the data directory reads as plain parquet
    assert(spark.read.parquet(dir).count() == 160000L)

    val pruned = Manifest.prunedRead(spark, dir, "k", 50000L, 52000L)
    val full = spark.read.parquet(dir)
      .filter(col("k") >= 50000L && col("k") <= 52000L)
    assert(pruned.as[(Long, Long)].collect().toSet ==
      full.as[(Long, Long)].collect().toSet)
    // a 2k-of-160k range intersects ~1 of 16 file ranges
    val n = filesRead(pruned)
    assert(n <= 2, s"manifest did not prune: read $n of 16 files")
  }

  test("a stale manifest never drops rows: unmanifested files are read unconditionally") {
    val dir = java.nio.file.Files.createTempDirectory("manifest_stale").toString
    spark.range(10000L).select(col("id").as("k"), col("id").as("v"))
      .repartitionByRange(4, col("k")).sortWithinPartitions(col("k"))
      .write.mode("overwrite").parquet(dir)
    Manifest.write(spark, dir, Seq("k"))
    // an ingest appends AFTER the manifest snapshot — including keys inside
    // the queried range
    spark.range(10000L, 10100L).select(col("id").as("k"), (col("id") + 1L).as("v"))
      .unionByName(spark.range(500L, 510L)
        .select((col("id") + 100000L).as("k"), col("id").as("v")))
      .coalesce(1).write.mode("append").parquet(dir)
    val pruned = Manifest.prunedRead(spark, dir, "k", 10050L, 10060L)
    val full = spark.read.parquet(dir)
      .filter(col("k") >= 10050L && col("k") <= 10060L)
    assert(pruned.as[(Long, Long)].collect().toSet ==
      full.as[(Long, Long)].collect().toSet)
    assert(pruned.count() == 11L, "appended rows dropped by stale manifest")
    // refresh restores tight pruning and keeps exactness
    Manifest.write(spark, dir, Seq("k"))
    val refreshed = Manifest.prunedRead(spark, dir, "k", 10050L, 10060L)
    assert(refreshed.as[(Long, Long)].collect().toSet ==
      full.as[(Long, Long)].collect().toSet)
  }

  test("the intersection predicate reaches the manifest's own parquet scan") {
    val dir = java.nio.file.Files.createTempDirectory("manifest_push").toString
    spark.range(100000L).select(col("id").as("k"), col("id").as("v"))
      .repartitionByRange(8, col("k")).sortWithinPartitions(col("k"))
      .write.mode("overwrite").parquet(dir)
    Manifest.write(spark, dir, Seq("k"))
    // the planning lookup must filter BEFORE collecting: the manifest read
    // carries pushed min_k/max_k filters, so at 10⁶ files the driver sees
    // surviving entries, not the whole manifest
    val m = spark.read.parquet(s"$dir/_graft_manifest")
      .filter((col("max_k").isNull || col("max_k") >= lit(10L)) &&
        (col("min_k").isNull || col("min_k") <= lit(20L)))
    val scan = m.queryExecution.executedPlan.collect {
      case f: FileSourceScanExec => f
    }.head
    val pushed = scan.metadata.getOrElse("PushedFilters", "")
    assert(pushed.contains("max_k") && pushed.contains("min_k"),
      s"intersection not pushed to the manifest scan: $pushed")
    // and the lookup itself stays correct on this larger manifest
    val pruned = Manifest.prunedRead(spark, dir, "k", 10L, 20L)
    assert(pruned.as[(Long, Long)].collect().map(_._1).toSet == (10L to 20L).toSet)
    assert(filesRead(pruned) <= 2)
  }

  test("manifest pruning with no intersecting file yields an empty typed frame") {
    val dir = java.nio.file.Files.createTempDirectory("manifest_empty").toString
    spark.range(1000L).select(col("id").as("k"), col("id").as("v"))
      .repartitionByRange(4, col("k")).sortWithinPartitions(col("k"))
      .write.mode("overwrite").parquet(dir)
    Manifest.write(spark, dir, Seq("k"))
    val out = Manifest.prunedRead(spark, dir, "k", 5000L, 6000L)
    assert(out.schema.fieldNames.toSeq == Seq("k", "v"))
    assert(out.count() == 0L)
  }
}
