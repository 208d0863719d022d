package graft.jobs

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Bpe

/** Disk-backed BPE vocabulary with incremental refresh — the tokenizer twin
  * of [[NearDupIndex]]'s frozen-state contract, closing the round-8
  * verdict's "streaming BPE vocab refresh" ask.
  *
  * The trick that makes the refresh EXACT rather than approximate: BPE
  * training is a pure function of the distinct-word histogram
  * ([[Bpe.wordCounts]] — merges never cross word boundaries, so every
  * global pair count is Σ cnt(word) × pairs-in-word), and histograms are
  * ADDITIVE under corpus slicing. So the index stores (word, cnt); a new
  * arrival batch is word-counted (batch-proportional — the only pass that
  * touches the batch text), summed into the stored histogram
  * (vocabulary-sized, uniform keys), and the merge table is retrained from
  * counts ([[Bpe.trainFromCounts]] — per-round cost ∝ vocabulary, NOT
  * corpus). The corpus text is never re-read; the refreshed vocabulary
  * equals a from-scratch [[Bpe.train]] over everything ingested so far,
  * under ANY slicing of arrivals (BpeVocabIndexSpec proves both).
  *
  * Layout under `path`:
  *  - `word_counts/ingest_batch=<b>/` — batch b's OWN (word, cnt)
  *    histogram; the corpus statistic is the additive fold (sum per
  *    word) over all partitions. The batch partitioning is the index
  *    family's crash/replay contract (SemDeDupIndex, AnnIndex,
  *    NearDupIndex): [[build]] owns batch 0, each refresh overwrites
  *    ONLY its own partition, so a re-delivered foreachBatch batch
  *    reproduces its counts instead of double-counting them — the
  *    property the previous whole-histogram staged-swap rewrite lacked
  *    (a replayed refresh would have summed the batch in twice). It
  *    also makes each refresh's write BATCH-sized, not
  *    vocabulary-sized;
  *  - `merges/`      — (round, lhs, rhs, merged, pair_count, n_rows_after),
  *                     the current trained merge table. DERIVED state:
  *                     retrained from the counts fold on every refresh,
  *                     so a crash between a counts write and the merges
  *                     write leaves a stale-but-valid table that the
  *                     replay (or any later refresh) heals;
  *  - `meta/`        — one (rounds) row, read back by refresh.
  *
  * Unlike NearDupIndex's frozen dictionary (which accepts drift until
  * rebuild), nothing here is approximate — counts fold losslessly — so
  * there is no rebuild()/drift contract to document. There is also no
  * [[LsmCompact]] compact(): a SUM statistic has no self-identifying
  * duplicate form for a crashed half-compact to heal from (the
  * SemDeDupIndex deltas argument), and the per-batch partitions are
  * vocabulary-bounded small files whose fold is one shuffle whatever
  * the partition count.
  */
object BpeVocabIndex {

  private def countsPart(path: String, b: Long) =
    s"$path/word_counts/ingest_batch=$b"

  /** The corpus word histogram: additive fold over all batch partitions. */
  def counts(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(s"$path/word_counts").drop("ingest_batch")
      .groupBy(col("word")).agg(sum(col("cnt")).as("cnt"))

  /** Build the vocabulary index from scratch over (id, text) docs —
    * ingest batch 0. */
  def build(docs: DataFrame, path: String, rounds: Int): Unit = {
    val spark = docs.sparkSession
    import spark.implicits._
    // rebuild-safe over a dirty path: clear previously appended batches
    // FIRST, or counts() would sum stale batch histograms into the fresh
    // build's training fold (IndexRebuildSpec)
    LsmCompact.clearAppendedBatches(spark, s"$path/word_counts")
    Bpe.wordCounts(docs).write.mode("overwrite")
      .parquet(countsPart(path, 0L))
    Bpe.trainFromCounts(counts(spark, path), rounds)
      .write.mode("overwrite").parquet(s"$path/merges")
    Seq(rounds).toDF("rounds").write.mode("overwrite").parquet(s"$path/meta")
  }

  /** Absorb arrival batch `batchId` (> 0, strictly increasing in arrival
    * order) and retrain: the batch is word-counted once (the only pass
    * that touches its text) into its own partition, then the merge table
    * is retrained from the counts fold ([[Bpe.trainFromCounts]] —
    * per-round cost ∝ vocabulary, NOT corpus). Returns the refreshed
    * merge table. */
  def refresh(spark: SparkSession, path: String, batchId: Long,
              newDocs: DataFrame): DataFrame = {
    require(batchId > 0, s"batch id $batchId: build owns 0, refreshes are > 0")
    val rounds = spark.read.parquet(s"$path/meta").head().getAs[Int]("rounds")
    Bpe.wordCounts(newDocs).write.mode("overwrite")
      .parquet(countsPart(path, batchId))
    Bpe.trainFromCounts(counts(spark, path), rounds)
      .write.mode("overwrite").parquet(s"$path/merges")
    spark.read.parquet(s"$path/merges")
  }

  /** The current merge table (for encoders that only need the vocab). */
  def merges(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(s"$path/merges")
}
