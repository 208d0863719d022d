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
  *  - `docsets/`    — (doc_id, gs, n, prefix): per-doc sorted gram-id sets
  *    + AllPairs prefix, the only state appends touch (append-only);
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

  /** Build the index from scratch over (id, text) docs. */
  def build(docs: DataFrame, path: String,
            gramLen: Int = 4, capNum: Int = 1, capDen: Int = 10,
            tNum: Int = 4, tDen: Int = 5): Unit = {
    val spark = docs.sparkSession
    import spark.implicits._
    val d = NearDup.normDocs(docs)
    val rare = NearDup.rarityDictionary(
      NearDup.charGramStream(d, gramLen), d.count(), capNum, capDen,
      spark.sparkContext.defaultParallelism)
    rare.write.mode("overwrite").parquet(s"$path/dictionary")
    val storedRare = spark.read.parquet(s"$path/dictionary")
    NearDup.docSetsAgainst(NearDup.charGramStream(d, gramLen), storedRare,
        tNum, tDen)
      .write.mode("overwrite").parquet(s"$path/docsets")
    Seq((gramLen, capNum, capDen, tNum, tDen))
      .toDF("gram_len", "cap_num", "cap_den", "t_num", "t_den")
      .write.mode("overwrite").parquet(s"$path/meta")
  }

  /** Flag a new batch against the stored corpus and absorb it into the
    * index. Returns (a_id, b_id, jaccard) covering new×stored and new×new
    * pairs under the FROZEN dictionary (grams unseen at build time are
    * ignored until [[build]] is re-run — the same drift contract as
    * AnnIndex.append). The pair set is materialized BEFORE the batch's doc
    * sets are appended: the pair plan reads `docsets/`, and appending first
    * would let the lazy scan see the batch on its own stored side. */
  def append(spark: SparkSession, path: String, newDocs: DataFrame): DataFrame = {
    val m = spark.read.parquet(s"$path/meta").head()
    val (gramLen, tNum, tDen) =
      (m.getAs[Int]("gram_len"), m.getAs[Int]("t_num"), m.getAs[Int]("t_den"))
    val rare = spark.read.parquet(s"$path/dictionary")
    val stored = spark.read.parquet(s"$path/docsets")
    val fresh = NearDup.normDocs(newDocs)
    val newSets = NearDup.docSetsAgainst(
      NearDup.charGramStream(fresh, gramLen), rare, tNum, tDen)
    val pairs = NearDup.incrementalPairsOver(
        stored.unionByName(newSets), fresh.select(col("doc_id")), tNum, tDen)
      .persist()
    pairs.count() // materialize before the append below mutates docsets/
    newSets.write.mode("append").parquet(s"$path/docsets")
    pairs
  }
}
