package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** File-level min/max statistics manifest — the pruning tier ABOVE parquet
  * row-group skipping (the Delta/Iceberg `add`-file-stats idea, on plain
  * parquet directories).
  *
  * Row-group skipping still OPENS every file's footer; at 100 TB a table is
  * millions of files and the footer reads alone dominate a selective query.
  * A manifest holds one row per data file with each stats column's min/max,
  * so scan planning is a driver-side lookup on a table ~10⁶× smaller than
  * the data: select the few files whose [min, max] intersects the predicate
  * and hand ONLY those paths to the reader. Zero I/O against every other
  * file — the third tier after directory partitions and this engine's
  * clustered writes ([[graft.operators.Scale.writeZordered]]), which are
  * what make the per-file ranges tight enough to prune against.
  *
  * The manifest lives under `<dataDir>/_graft_manifest`; Spark's file index
  * ignores `_`-prefixed paths, so the data directory stays readable as plain
  * parquet for every other consumer.
  */
object Manifest {

  private def manifestPath(dataDir: String) = s"$dataDir/_graft_manifest"

  /** Collect per-file min/max for `statsCols` and write the manifest. One
    * column-pruned scan of only the stats columns (cheap next to the write
    * that produced the files; a writer integrated with the layout jobs
    * would fold this into the write pass itself). */
  def write(spark: SparkSession, dataDir: String, statsCols: Seq[String]): Unit = {
    val aggs = statsCols.flatMap(c =>
      Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c")))
    spark.read.parquet(dataDir)
      .select(statsCols.map(col): _*)
      .groupBy(input_file_name().as("file"))
      .agg(aggs.head, aggs.tail: _*)
      .coalesce(1)
      .write.mode("overwrite").parquet(manifestPath(dataDir))
  }

  /** Current data files of the directory (one FS listing — the same driver
    * cost every read already pays), `_`/`.`-prefixed paths excluded. */
  private def listDataFiles(spark: SparkSession, dataDir: String): Seq[String] = {
    val p = new org.apache.hadoop.fs.Path(dataDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(p).toSeq
      .filter(_.isFile)
      .map(_.getPath)
      .filter(n => !n.getName.startsWith("_") && !n.getName.startsWith("."))
      .map(_.toString)
  }

  /** Paths of the files whose [min, max] range on `keyCol` intersects
    * [lo, hi] — the driver-side planning lookup. Files present in the
    * directory but ABSENT from the manifest (appended since the last
    * [[write]]) are included unconditionally: a stale manifest must never
    * drop rows, it only prunes less until refreshed. Matching is by file
    * name (unique within a directory) so the manifest's
    * `input_file_name()` URIs and the FS listing's need no scheme
    * normalization. */
  def pruneFiles(spark: SparkSession, dataDir: String, keyCol: String,
                 lo: Any, hi: Any): Seq[String] = {
    import spark.implicits._
    def base(p: String) = p.substring(p.lastIndexOf('/') + 1)
    val m = spark.read.parquet(manifestPath(dataDir))
    val mn = col(s"min_$keyCol")
    val mx = col(s"max_$keyCol")
    // [mn, mx] ∩ [lo, hi] ≠ ∅, null stats unbounded — expressed as a
    // Column predicate so it reaches the manifest's OWN parquet scan
    // (PushedFilters + row-group stats on min_/max_): the driver collect
    // below is over the SURVIVING entries only, not the whole manifest.
    // Spark compares in the key column's native type (long-exact for
    // integral keys; a lossy double round-trip here would DROP a file).
    val intersects =
      (mx.isNull || mx >= lit(lo)) && (mn.isNull || mn <= lit(hi))
    val selected = m.filter(intersects)
      .select(col("file")).collect().map(r => base(r.getString(0))).toSet
    // Stale-append safety: files in the listing but absent from the
    // manifest are kept unconditionally — computed as an anti-join of the
    // (driver-held) listing against the manifest's name column, so the
    // full manifest is never collected. Envelope: the FS listing itself is
    // the driver-side bound (~10⁶ names ≈ 100 MB of strings, the same
    // cost Delta's log replay pays); both collects here return strictly
    // fewer rows than that (survivors + unmanifested appends).
    val listed = listDataFiles(spark, dataDir)
    val unmanifested = listed.map(base).toDF("b")
      .join(m.select(substring_index(col("file"), "/", -1).as("b")),
        Seq("b"), "left_anti")
      .as[String].collect().toSet
    listed.filter(f => selected.contains(base(f)) || unmanifested.contains(base(f)))
  }

  /** Read only the manifest-selected files, with the exact predicate kept on
    * the scan (manifest ranges admit whole files; the residual filter — and
    * below it, row-group stats — trims inside them). Equals the full
    * `read.filter` result by construction: a file outside every selected
    * range can hold no matching row. */
  def prunedRead(spark: SparkSession, dataDir: String, keyCol: String,
                 lo: Any, hi: Any): DataFrame = {
    val files = pruneFiles(spark, dataDir, keyCol, lo, hi)
    val residual = col(keyCol) >= lit(lo) && col(keyCol) <= lit(hi)
    if (files.isEmpty)
      // no candidate files: an empty frame in the table's schema (schema
      // comes from one footer read of the directory; no data is scanned)
      spark.read.parquet(dataDir).where(lit(false))
    else spark.read.parquet(files: _*).where(residual)
  }
}
