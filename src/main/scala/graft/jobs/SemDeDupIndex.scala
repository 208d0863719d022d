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
  * shadow-pair set over `old ∪ batch` is the disjoint union of old-only
  * pairs (already aggregated in `removals/`) and pairs touching the batch
  * (computed batch-proportionally), and both removals aggregates are
  * commutative monoids (`kept_by` = min, `n_shadows` = sum). So after any
  * slicing of arrivals, the stored removals table equals a from-scratch
  * batch run under the same centroids — SemDeDupIndexSpec proves it under
  * ordered and interleaved slicings, including a late LOW-id arrival that
  * flips an earlier member's removed status.
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
  *  - `members/`   — (vec_id, cluster, embedding, n2), append-only;
  *  - `removals/`  — (removed_id, cluster, kept_by, n_shadows), the
  *                   current aggregate, staged-swapped per append;
  *  - `meta/`      — (k, iters) build parameters, for the record.
  *
  * Scale shape: append assigns the batch map-only against broadcast-sized
  * centroid literals, then joins batch × stored members on the cluster id
  * — work ∝ batch × cluster-size, never old × old, and the corpus
  * embeddings are only ever read through the cluster-pruned members join.
  */
object SemDeDupIndex {

  /** Build the index from scratch over (vec_id, embedding) vectors. */
  def build(vecs: DataFrame, path: String, k: Int, iters: Int = 2): Unit = {
    val spark = vecs.sparkSession
    import spark.implicits._
    val (assign, cents) = KMeans.lloyd(vecs, "vec_id", "embedding", k, iters)
    cents.write.mode("overwrite").parquet(s"$path/centroids")
    SemDedup.members(vecs, assign)
      .write.mode("overwrite").parquet(s"$path/members")
    val stored = spark.read.parquet(s"$path/members")
    SemDedup.removals(SemDedup.shadowPairs(stored))
      .write.mode("overwrite").parquet(s"$path/removals")
    Seq((k, iters)).toDF("k", "iters")
      .write.mode("overwrite").parquet(s"$path/meta")
  }

  /** Absorb a new batch: assign against the FROZEN centroids, score only
    * pairs touching the batch, fold their aggregates into `removals/`
    * (staged swap — the merge plan reads the live dir), then append the
    * batch to `members/`. Returns the refreshed removals table.
    *
    * Ordering matters twice: the merged removals are materialized to the
    * stage dir BEFORE the swap (the lazy plan reads the old `removals/`),
    * and the batch is appended to `members/` LAST (the pair plan reads
    * `members/` as the stored side — appending first would let the scan
    * see the batch on both sides). */
  def append(spark: SparkSession, path: String, newVecs: DataFrame): DataFrame = {
    val cents = spark.read.parquet(s"$path/centroids")
    val assign = KMeans.assignTo(newVecs, "vec_id", "embedding", cents)
    val fresh = SemDedup.members(newVecs, assign)
    val stored = spark.read.parquet(s"$path/members")
    val merged = SemDedup.mergeRemovals(
      spark.read.parquet(s"$path/removals"),
      SemDedup.removals(SemDedup.incrementalShadowPairs(stored, fresh)))
    merged.write.mode("overwrite").parquet(s"$path/removals_stage")
    // swap on the filesystem OWNING the index path (BpeVocabIndex
    // precedent), both booleans checked so a failed rename can't strand
    // the only copy silently
    val live = new org.apache.hadoop.fs.Path(s"$path/removals")
    val stage = new org.apache.hadoop.fs.Path(s"$path/removals_stage")
    val fs = live.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.delete(live, true) && fs.exists(live))
      throw new java.io.IOException(s"could not delete $live for swap")
    if (!fs.rename(stage, live))
      throw new java.io.IOException(
        s"rename $stage -> $live failed; removals preserved in stage dir")
    fresh.write.mode("append").parquet(s"$path/members")
    spark.read.parquet(s"$path/removals")
  }

  /** The current removals table. */
  def removals(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(s"$path/removals")
}
