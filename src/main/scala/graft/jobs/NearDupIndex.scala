package graft.jobs

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.NearDup

/** Disk-backed near-duplicate index with incremental append — the text twin
  * of [[AnnIndex]]'s cluster-partitioned layout, completing the parallel
  * t29's frozen-dictionary contract draws: AnnIndex freezes CENTROIDS on
  * disk and assigns new vectors to them; this freezes the RARITY DICTIONARY
  * on disk and fingerprints new documents against it, so an ingest pipeline
  * flags each arriving batch against the whole corpus WITHOUT recomputing
  * (or even rescanning) the corpus text.
  *
  * Layout under `path`:
  *  - `dictionary/` — (tok, tok_id): the DF-capped rarity ranks, frozen at
  *    build time (document frequencies of a large corpus move negligibly
  *    per batch; rebuild() refreshes when drift accumulates);
  *  - `docsets/ingest_batch=<b>/` — (doc_id, gs, n, prefix): per-doc
  *    sorted gram-id sets + AllPairs prefix, the only state appends
  *    touch. The batch partitioning is the family's crash/replay
  *    contract (SemDeDupIndex, AnnIndex): [[build]] owns batch 0, each
  *    append overwrites ONLY its own partition, so a re-delivered
  *    foreachBatch batch reproduces its doc sets instead of duplicating
  *    them — the property the previous `mode("append")` lacked;
  *  - `meta/`       — one row of build parameters, read back by append so
  *    the two sides can never disagree on gramLen/cap/threshold.
  *
  * Scale shape: append reads the stored DOC SETS (already tokenized,
  * already prefix-cut — a fraction of the corpus text) plus the new batch;
  * candidates come from stored-prefix × new-prefix postings with the same
  * length/positional prunes as [[NearDup.jaccardPairs]], so pair work
  * scales with the batch. The corpus text itself is never re-read.
  */
object NearDupIndex {

  private def docsetsPart(path: String, b: Long) =
    s"$path/docsets/ingest_batch=$b"

  /** Build the index from scratch over (id, text) docs — ingest batch 0. */
  def build(docs: DataFrame, path: String,
            gramLen: Int = 4, capNum: Int = 1, capDen: Int = 10,
            tNum: Int = 4, tDen: Int = 5): Unit = {
    val spark = docs.sparkSession
    import spark.implicits._
    // rebuild-safe over a dirty path: clear previously appended batches
    // FIRST, or doc sets fingerprinted under the OLD dictionary would mix
    // into every later pair join (IndexRebuildSpec)
    LsmCompact.clearAppendedBatches(spark, s"$path/docsets")
    val d = NearDup.normDocs(docs)
    val rare = NearDup.rarityDictionary(
      NearDup.charGramStream(d, gramLen), d.count(), capNum, capDen,
      spark.sparkContext.defaultParallelism)
    rare.write.mode("overwrite").parquet(s"$path/dictionary")
    val storedRare = spark.read.parquet(s"$path/dictionary")
    NearDup.docSetsAgainst(NearDup.charGramStream(d, gramLen), storedRare,
        tNum, tDen)
      .write.mode("overwrite").parquet(docsetsPart(path, 0L))
    Seq((gramLen, capNum, capDen, tNum, tDen))
      .toDF("gram_len", "cap_num", "cap_den", "t_num", "t_den")
      .write.mode("overwrite").parquet(s"$path/meta")
  }

  /** Flag arrival batch `batchId` (> 0, strictly increasing in arrival
    * order) against the stored corpus and absorb it into the index.
    * Returns (a_id, b_id, jaccard) covering new×stored and new×new pairs
    * under the FROZEN dictionary (grams unseen at build time are ignored
    * until [[build]] is re-run — the same drift contract as
    * AnnIndex.append). The batch's doc sets are written FIRST and read
    * back as the fresh side, so the pair plan executes over immutable
    * on-disk state; the stored side filters `ingest_batch <= batchId`,
    * so neither a replay racing later batches nor lazy consumption of
    * the returned pairs can see batches that arrived afterwards — the
    * returned frame is MATERIALIZED (localCheckpoint) before this method
    * returns, because its stored side is the lazy `ingest_batch <=
    * batchId` disk filter: if a later [[compact]] ran before a lazy
    * consumer executed the plan, later batches would have folded into
    * batch 0 and passed the filter, silently admitting future docs. */
  def append(spark: SparkSession, path: String, batchId: Long,
             newDocs: DataFrame): DataFrame = {
    require(batchId > 0, s"batch id $batchId: build owns 0, appends are > 0")
    LsmCompact.withAppendLease(spark, s"$path/docsets") {
      val m = spark.read.parquet(s"$path/meta").head()
      val (gramLen, tNum, tDen) =
        (m.getAs[Int]("gram_len"), m.getAs[Int]("t_num"), m.getAs[Int]("t_den"))
      val rare = spark.read.parquet(s"$path/dictionary")
      val fresh = NearDup.normDocs(newDocs)
      NearDup.docSetsAgainst(NearDup.charGramStream(fresh, gramLen), rare,
          tNum, tDen)
        .write.mode("overwrite").parquet(docsetsPart(path, batchId))
      val upTo = spark.read.parquet(s"$path/docsets")
        .filter(col("ingest_batch") <= batchId).drop("ingest_batch")
      NearDup.incrementalPairsOver(upTo, fresh.select(col("doc_id")),
          tNum, tDen)
        .localCheckpoint() // pin the <= batchId snapshot against compact()
    }
  }

  /** Fold every docsets `ingest_batch` partition back into batch 0 — the
    * family's LSM compaction ([[AnnIndex.compact]] scaladoc carries the
    * shared crash contract: batch 0 is written before the higher batches
    * delete, duplicates are transient and byte-identical, the
    * `dropDuplicates` in the fold makes a re-run heal exactly; run with
    * ingest paused). Returns the folded batch ids. */
  def compact(spark: SparkSession, path: String): Seq[Long] =
    LsmCompact.fold(spark, s"$path/docsets", "doc_id",
      (folded, target) => folded.write.mode("overwrite").parquet(target))
}
