package graft.jobs

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The shared LSM fold under the index family's `compact` methods
  * (AnnIndex, SemDeDupIndex, NearDupIndex): every batch-partitioned
  * table (`<root>/ingest_batch=<b>/…`) folds back into batch 0, with the
  * same crash contract everywhere — batch 0 is WRITTEN before the higher
  * batches are deleted, so a crash between the two leaves transient
  * duplicate copies; those copies are byte-identical rows, so the
  * `dropDuplicates(keyCol)` inside the fold makes a re-run heal exactly.
  *
  * Append-vs-compact contract: [[fold]] drops a `_compacting` marker file
  * at the table root before reading and lifts it only on SUCCESSFUL
  * completion; every index append calls [[assertNotCompacting]] before
  * writing, so an append issued while a compact is in-flight — or after
  * one crashed — fails LOUDLY instead of landing a batch id the delete
  * step then removes (batch counters may restart above 0 after compact)
  * or double-counting against transient duplicate copies. The fence is
  * check-then-act, not a mutex: an append that passed the check just
  * before the marker appeared can still interleave, so the operational
  * rule remains "run compact with ingest paused" — the marker converts
  * the common mistake (appends issued after compact began, or resumed
  * after a crashed compact) from silent corruption into an error. A
  * leftover marker is healed by re-running compact (the heal path), or by
  * build() (the full reset). Spark's scans ignore `_`-prefixed files, so
  * the marker never pollutes reads. */
private[jobs] object LsmCompact {

  private def marker(root: String) = new org.apache.hadoop.fs.Path(s"$root/_compacting")

  private def fsOf(spark: SparkSession, p: org.apache.hadoop.fs.Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Fail-fast fence for appends: refuse while a compact on `root` is
    * in-flight or crashed without completing (see the object scaladoc). */
  def assertNotCompacting(spark: SparkSession, root: String): Unit = {
    val m = marker(root)
    require(!fsOf(spark, m).exists(m),
      s"$root holds a _compacting marker: a compact is in-flight or " +
        "crashed mid-fold. Re-run compact to heal and lift the fence " +
        "(or rebuild), then retry the append.")
  }

  /** Recursively delete `dir` through the path's OWN Hadoop filesystem —
    * the layer every read/write in this family already goes through, so
    * hdfs:// and s3a:// roots delete correctly (java.nio would report
    * "not exists" for them and silently no-op, leaving duplicate copies
    * permanently visible while the caller believes the index is compact).
    * No-op when the directory does not exist. */
  def deleteDir(spark: SparkSession, dir: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
  }

  /** Clear every `ingest_batch=<b>` partition ABOVE batch 0 under `root` —
    * the rebuild pre-step each index's build() runs so an in-place rebuild
    * over a path that already holds appended batches starts clean instead
    * of silently mixing stale batch >= 1 state (assigned under the OLD
    * centroids / dictionary / histogram) into the fresh index. Listing
    * goes through the same Hadoop filesystem as [[deleteDir]]. */
  def clearAppendedBatches(spark: SparkSession, root: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(root)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p))
      fs.listStatus(p).foreach { st =>
        val name = st.getPath.getName
        if (name.startsWith("ingest_batch=") &&
            name.stripPrefix("ingest_batch=") != "0")
          fs.delete(st.getPath, true)
      }
    // build is the full reset: a crashed compact's leftover fence lifts too
    if (fs.exists(marker(root))) fs.delete(marker(root), false)
  }

  /** Fold `root`'s ingest_batch partitions into batch 0. `write` lands
    * the folded frame at `<root>/ingest_batch=0` (caller chooses
    * partitioning/layout within it). Returns the folded-away batch ids
    * (empty = already compact, nothing written). */
  def fold(spark: SparkSession, root: String, keyCol: String,
           write: DataFrame => Unit): Seq[Long] = {
    val m = marker(root)
    val fs = fsOf(spark, m)
    // fence appends FIRST (overwrite ok: a compact re-run IS the heal
    // path for a crashed predecessor's leftover marker)
    fs.create(m, true).close()
    val all = spark.read.parquet(root)
    val batches = all.select(col("ingest_batch").cast("long"))
      .distinct().collect().map(_.getLong(0)).toSeq.sorted
    if (batches.length <= 1) { fs.delete(m, false); return Seq.empty }
    val folded = all.drop("ingest_batch")
      .dropDuplicates(keyCol) // heals a crashed prior compact's leftovers
      .localCheckpoint() // materialize BEFORE overwriting what we read
    write(folded)
    val gone = batches.filter(_ > 0L)
    gone.foreach(b => deleteDir(spark, s"$root/ingest_batch=$b"))
    // lift the fence only after the fold fully completed — a crash
    // anywhere above leaves the marker, and appends stay fenced until a
    // compact re-run heals
    fs.delete(m, false)
    gone
  }
}
