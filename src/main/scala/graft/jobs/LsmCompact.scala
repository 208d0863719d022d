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
  * completion; every index append runs inside [[withAppendLease]], which
  * atomically creates a per-append `_append_<id>` lease (create with
  * overwrite = false — the filesystem's atomic primitive) and RE-CHECKS
  * the marker after the lease is visible. [[fold]], symmetrically, lists
  * leases AFTER its marker is visible and stands down (deleting its
  * marker) if any exist. Under a linearizable filesystem metadata layer
  * (HDFS, local; S3 is read-after-write consistent since 2020) every
  * interleaving now resolves safely: whichever side's artifact lands
  * second sees the other's and aborts — an append can no longer slip
  * between the compact's old check-then-act window (the round-10 fence's
  * one acknowledged hole) and land a batch id the delete step then
  * removes, or double-count against transient duplicate copies. A crash
  * leaves the artifact on disk and fails the OTHER side loudly: a
  * leftover marker is healed by re-running compact (the heal path) or by
  * build(); a leftover lease (crashed append) is named in compact's
  * error and cleared by build() (the full reset) or manual delete after
  * confirming the append is dead — and after clearing it, REPLAY that
  * append (idempotent partition overwrite) BEFORE any compact runs: a
  * fold cannot tell a dead append's half-ingested partition from a
  * completed one, so compact-before-replay folds the partial batch into
  * batch 0 and the replay then double-ingests it — harmless where state
  * is key-deduped rows (the next fold heals), but permanently inflating
  * for delta AGGREGATES (SemDeDupIndex n_shadows; caught by
  * CrashDrillSpec's randomized kills, round 14). Replay-first is also
  * the natural restart order: a streaming foreachBatch redelivers the
  * failed batch before any maintenance window compacts. Spark's scans
  * ignore `_`-prefixed files, so neither artifact pollutes reads. */
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

  private def leasePrefix = "_append_"

  /** Run an append body under an atomic lease on `root` — the mutual-
    * exclusion half of the append-vs-compact fence (object scaladoc).
    * Protocol: fail fast if the compact marker exists; atomically create
    * `_append_<uuid>` (create with overwrite = false); RE-CHECK the
    * marker — a compact whose marker landed between our first check and
    * our lease either sees the lease (and stands down) or made its
    * marker visible before this re-check (and we stand down, lease
    * released). The lease is held for the whole body — including any
    * localCheckpoint that pins the returned frame — and always released,
    * so a completed append leaves nothing behind; a crashed one leaves a
    * lease that compact names in its error. */
  def withAppendLease[A](spark: SparkSession, root: String)(body: => A): A = {
    assertNotCompacting(spark, root)
    val lease = new org.apache.hadoop.fs.Path(
      s"$root/$leasePrefix${java.util.UUID.randomUUID().toString.replace("-", "")}")
    val fs = fsOf(spark, lease)
    fs.create(lease, false).close()
    try {
      val m = marker(root)
      require(!fs.exists(m),
        s"$root: a compact began while this append was acquiring its " +
          "lease; the append stood down cleanly. Wait for the compact " +
          "(or heal its crash), then retry.")
      body
    } finally fs.delete(lease, false)
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
    * goes through the same Hadoop filesystem as [[deleteDir]].
    *
    * CALLER CONTRACT: this runs EAGERLY at the top of build(), before the
    * input DataFrame is materialized — so build()'s input must come from
    * the SOURCE CORPUS, never lazily from the index path itself: a plan
    * that reads `ingest_batch >= 1` data under `root` would silently lose
    * it here before executing. An in-place "rebuild from the index" is
    * expressed as compact() (fold, which materializes before deleting),
    * not build(). */
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
    // build is the full reset: a crashed compact's leftover fence lifts,
    // crashed appends' leftover leases clear, and a crashed fold's
    // staging / move-aside dirs drop (build rewrites batch 0 itself)
    if (fs.exists(p))
      fs.listStatus(p).map(_.getPath)
        .filter(_.getName.startsWith(leasePrefix))
        .foreach(fs.delete(_, false))
    deleteDir(spark, s"$root/_fold_staging")
    deleteDir(spark, s"$root/_fold_old")
    if (fs.exists(marker(root))) fs.delete(marker(root), false)
  }

  /** Fold `root`'s ingest_batch partitions into batch 0. `write` lands
    * the folded frame at the TARGET PATH it is handed (caller chooses
    * partitioning/layout within it — never hardcode the batch-0 path:
    * fold stages the rewrite). Returns the folded-away batch ids
    * (empty = already compact, nothing written).
    *
    * Batch-0 rewrite protocol (round 14): the folded frame is written to
    * `_fold_staging` and SWAPPED in by rename — never overwritten in
    * place. The old in-place overwrite had an unhealable window: Spark's
    * overwrite deletes batch 0 before committing the new copy, so a
    * crash mid-write destroyed every batch-0-unique row (the index CORE
    * — appends hold only increments) with the sole surviving copy in the
    * dead JVM's localCheckpoint; "re-run heals" was false there. Now:
    * (1) write staging (underscore prefix → invisible to reads), (2)
    * move batch 0 aside to `_fold_old`, (3) promote staging, (4) drop
    * the old copy and the higher batches, (5) lift the fence. A complete
    * batch 0 exists at every instant except between (2) and (3) — two
    * metadata renames — and the heal step at the next fold's start
    * restores the move-aside copy from exactly that window. Crashes
    * anywhere else leave either pristine state + a stale staging
    * (overwritten next run) or the folded batch 0 + stale `_fold_old` /
    * higher batches (dropped / re-deduped next run). Randomized
    * validation: CrashDrillSpec kills the flow at arbitrary filesystem
    * write boundaries and re-runs until heal, asserting no state loses
    * rows. */
  def fold(spark: SparkSession, root: String, keyCol: String,
           write: (DataFrame, String) => Unit): Seq[Long] = {
    val m = marker(root)
    val fs = fsOf(spark, m)
    // fence appends FIRST (overwrite ok: a compact re-run IS the heal
    // path for a crashed predecessor's leftover marker) ...
    fs.create(m, true).close()
    // ... then stand down if any append lease is visible: the lease side
    // re-checks our marker after creating its lease, so whichever
    // artifact landed second aborts — no interleaving survives. A lease
    // we see here is either a live append (let it finish, re-run compact)
    // or a crashed one (named below; clear it via build() or manually).
    val leases = fs.listStatus(new org.apache.hadoop.fs.Path(root))
      .map(_.getPath.getName).filter(_.startsWith(leasePrefix))
    if (leases.nonEmpty) {
      fs.delete(m, false)
      throw new IllegalStateException(
        s"$root has append leases in flight (or crashed): " +
          leases.mkString(", ") + ". Compact stood down; let the appends " +
          "finish and re-run, or clear stale leases via build()/manual " +
          "delete after confirming the appends are dead.")
    }
    val b0 = new org.apache.hadoop.fs.Path(s"$root/ingest_batch=0")
    val old = new org.apache.hadoop.fs.Path(s"$root/_fold_old")
    val staging = s"$root/_fold_staging"
    // heal a predecessor crashed in its (2)-(3) swap window: batch 0
    // absent, the move-aside copy complete — restore it before reading,
    // or the fold below would silently lose every batch-0-unique row
    if (fs.exists(old)) {
      if (!fs.exists(b0))
        require(fs.rename(old, b0), s"fold heal: restore rename failed for $root")
      else fs.delete(old, true) // promote completed; the aside copy is stale
    }
    val all = spark.read.parquet(root)
    val batches = all.select(col("ingest_batch").cast("long"))
      .distinct().collect().map(_.getLong(0)).toSeq.sorted
    if (batches.length <= 1) {
      deleteDir(spark, staging) // stale leftover from a crashed write
      fs.delete(m, false); return Seq.empty
    }
    val folded = all.drop("ingest_batch")
      .dropDuplicates(keyCol) // heals a crashed prior compact's leftovers
      .localCheckpoint() // materialize BEFORE swapping out what we read
    write(folded, staging)
    // swap: batch 0 aside, staging promoted — the only instant without a
    // live batch 0 is between these two renames, covered by the heal
    require(fs.rename(b0, old), s"fold: move-aside rename failed for $root")
    require(fs.rename(new org.apache.hadoop.fs.Path(staging), b0),
      s"fold: promote rename failed for $root")
    fs.delete(old, true)
    val gone = batches.filter(_ > 0L)
    gone.foreach(b => deleteDir(spark, s"$root/ingest_batch=$b"))
    // lift the fence only after the fold fully completed — a crash
    // anywhere above leaves the marker, and appends stay fenced until a
    // compact re-run heals
    fs.delete(m, false)
    gone
  }
}
