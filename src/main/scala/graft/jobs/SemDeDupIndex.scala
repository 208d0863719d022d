package graft.jobs

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{KMeans, SemDedup}

/** Disk-backed semantic-dedup index with exact incremental append — the
  * vector twin of [[BpeVocabIndex]]'s additive-statistic contract and the
  * third leg of the frozen-state family (AnnIndex freezes IVF centroids,
  * NearDupIndex freezes the rarity dictionary, this freezes the SemDeDup
  * clustering).
  *
  * What makes append EXACT rather than approximate (see
  * [[graft.operators.SemDedup]]): with the cluster assignment frozen, the
  * shadow-pair set over the whole corpus partitions DISJOINTLY by the
  * higher ingest-batch id of each pair — batch b owns (earlier × b) ∪
  * (b × b under a_id < b_id) — and both removals aggregates are
  * commutative monoids (`kept_by` = min, `n_shadows` = sum). So each
  * batch's aggregate delta is computed once, batch-proportionally, and
  * [[removals]] folds the deltas to exactly the from-scratch batch run
  * under the same centroids, whatever the arrival slicing
  * (SemDeDupIndexSpec proves ordered and interleaved slicings, plus a
  * late LOW-id arrival flipping an earlier member's removed status).
  *
  * Crash/replay contract (the DecontamStream batch_id-overwrite pattern —
  * exactly Structured Streaming's foreachBatch model): callers assign
  * strictly increasing batch ids in arrival order ([[build]] owns 0).
  * Every append writes ONLY its own two partitions
  * (`members/ingest_batch=b`, `deltas/ingest_batch=b`), deterministically
  * overwriting them, and its stored side is `ingest_batch < b` — so a
  * crashed or re-delivered append(b) reproduces byte-identical partitions
  * (idempotent) even if later batches already landed, and a crash between
  * the two partition writes is healed by the replay. No cross-partition
  * swap exists to half-complete.
  *
  * Drift contract: like AnnIndex (and unlike BpeVocabIndex, whose
  * statistic needs no freeze), the CLUSTERING is what's frozen — centroids
  * trained at build time bound every later comparison, so a corpus whose
  * embedding distribution drifts accumulates cross-cluster misses until
  * [[build]] is re-run. The s13 gate hash-proves the frozen-assignment
  * semantics cross-engine at k=8.
  *
  * Layout under `path`:
  *  - `centroids/` — (cluster, i, cv) long-format, FROZEN at build;
  *  - `members/ingest_batch=b/` — (vec_id, cluster, embedding, n2);
  *  - `deltas/ingest_batch=b/`  — batch b's removals aggregate
  *    (removed_id, cluster, kept_by, n_shadows);
  *  - `meta/` — (k, iters) build parameters, for the record.
  *
  * Scale shape: append assigns the batch map-only against broadcast-sized
  * centroid literals, writes it ONCE, and re-reads the on-disk copy for
  * the pair join (batch × stored members on the cluster id) — work ∝
  * batch × cluster-size, never old × old; the corpus embeddings are only
  * ever read through the cluster-pruned members join. Deltas are
  * aggregate-sized; [[removals]] folds them with one small shuffle.
  */
object SemDeDupIndex {

  private def membersPart(path: String, b: Long) =
    s"$path/members/ingest_batch=$b"
  private def deltasPart(path: String, b: Long) =
    s"$path/deltas/ingest_batch=$b"

  /** The members table across all ingested batches, with the
    * `ingest_batch` partition column. */
  private def allMembers(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(s"$path/members")

  /** Build the index from scratch over (vec_id, embedding) vectors —
    * ingest batch 0. */
  def build(vecs: DataFrame, path: String, k: Int, iters: Int = 2): Unit = {
    val spark = vecs.sparkSession
    import spark.implicits._
    // rebuild-safe over a dirty path: clear previously appended batches
    // FIRST, or the stale members (assigned under the OLD centroids) and
    // stale deltas would fold into removals() forever (IndexRebuildSpec)
    LsmCompact.clearAppendedBatches(spark, s"$path/members")
    LsmCompact.clearAppendedBatches(spark, s"$path/deltas")
    val (assign, cents) = KMeans.lloyd(vecs, "vec_id", "embedding", k, iters)
    cents.write.mode("overwrite").parquet(s"$path/centroids")
    SemDedup.members(vecs, assign)
      .write.mode("overwrite").parquet(membersPart(path, 0L))
    val stored = spark.read.parquet(membersPart(path, 0L))
    SemDedup.removals(SemDedup.shadowPairs(stored))
      .write.mode("overwrite").parquet(deltasPart(path, 0L))
    Seq((k, iters)).toDF("k", "iters")
      .write.mode("overwrite").parquet(s"$path/meta")
  }

  /** Absorb arrival batch `batchId` (> 0, strictly increasing in arrival
    * order): assign against the FROZEN centroids, write the batch's
    * members partition, then compute and write its removals delta —
    * pairs between earlier batches and this one plus this batch's
    * internal pairs, aggregated. Returns the refreshed [[removals]].
    *
    * The members partition is written FIRST and read back as the fresh
    * side, so the batch plan executes once; the stored side filters
    * `ingest_batch < batchId`, so neither a replay racing later batches
    * nor the batch's own partition can leak into it. */
  def append(spark: SparkSession, path: String, batchId: Long,
             newVecs: DataFrame): DataFrame = {
    require(batchId > 0, s"batch id $batchId: build owns 0, appends are > 0")
    LsmCompact.withAppendLease(spark, s"$path/members") {
      val cents = spark.read.parquet(s"$path/centroids")
      val assign = KMeans.assignTo(newVecs, "vec_id", "embedding", cents)
      SemDedup.members(newVecs, assign)
        .write.mode("overwrite").parquet(membersPart(path, batchId))
      val fresh = spark.read.parquet(membersPart(path, batchId))
      val stored = allMembers(spark, path)
        .filter(col("ingest_batch") < batchId).drop("ingest_batch")
      SemDedup.removals(SemDedup.incrementalShadowPairs(stored, fresh))
        .write.mode("overwrite").parquet(deltasPart(path, batchId))
      removals(spark, path)
    }
  }

  /** The current removals table: the monoid fold over all batch deltas
    * ((min, sum) per (removed_id, cluster) — aggregate-sized input). */
  def removals(spark: SparkSession, path: String): DataFrame =
    SemDedup.foldRemovals(
      spark.read.parquet(s"$path/deltas").drop("ingest_batch"))

  /** Fold every members `ingest_batch` partition back into batch 0 — the
    * LSM compaction for the one table that grows a file set per batch.
    * MEMBERS ONLY, and that is exactness, not laziness: the stored deltas
    * are keyed by pair CONTENT, not by where their members sit, so moving
    * all members into batch 0 changes neither [[removals]] (which never
    * reads members) nor any future [[append]] (whose stored side is
    * `ingest_batch < b` — all of batch 0 qualifies, same content). The
    * deltas table needs no compaction: it is aggregate-sized and the fold
    * is one small shuffle whatever its partition count — and folding it
    * in place would be UNSAFE, since `n_shadows = sum` cannot tell a
    * crashed half-compact's leftovers from real deltas (members heal via
    * `dropDuplicates` because duplicate copies are byte-identical rows; a
    * sum has no such self-identifying form).
    *
    * Crash contract (same as AnnIndex.compact): batch 0 is written before
    * the higher batches are deleted, so a crash between the two leaves
    * transient duplicate members — appends in that window would
    * double-count stored-side pairs, so run compaction with ingest
    * paused; the re-run heals exactly. Returns the folded batch ids. */
  def compact(spark: SparkSession, path: String): Seq[Long] =
    LsmCompact.fold(spark, s"$path/members", "vec_id",
      (folded, target) => folded.write.mode("overwrite").parquet(target))
}
