package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-trained bigram language model scoring — the perplexity-proxy
  * quality filter (CCNet/Gopher style): a document whose word transitions
  * are unlike the corpus scores low and is dropped from the training mix.
  *
  * ONE definition shared by the oracle-gated query (t24_bigram_lm_score)
  * and the corpus pipeline's filter stage (jobs/CorpusPipeline), so the
  * pipeline's cut can never silently diverge from the hash-matched
  * semantics. See t24's comment for the scale analysis (two
  * partial-aggregable groupBys + one shuffle join against the
  * vocab²-bounded dictionary; AQE splits the zipf-skewed stop-word
  * prefixes).
  */
object LangModel {

  /** Per-document bigram log-probability under the corpus's own MLE bigram
    * model: (doc_id, n_bigrams, sum_q, avg_logp) where sum_q is the exact
    * integer sum of floor(1e4·ln P(w2|w1)) — order-free and
    * partition-count-invariant — and avg_logp = sum_q/n/1e4 is the display
    * form. Documents with fewer than two words produce no row. */
  def bigramScores(docs: DataFrame): DataFrame = {
    val b = docs
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
      .filter(size(col("ws")) >= 2) // sequence() counts DOWN below 1 elem
      .select(col("doc_id"), explode(expr(
        "transform(sequence(1, size(ws)-1), j -> struct(ws[j-1] AS w1, ws[j] AS w2))")).as("g"))
      .select(col("doc_id"), col("g.w1").as("w1"), col("g.w2").as("w2"))
    val c12 = b.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c12"))
    val c1 = c12.groupBy(col("w1")).agg(sum(col("c12")).as("c1"))
    val dict = c12.join(c1, "w1")
    b.join(dict, Seq("w1", "w2"))
      .select(col("doc_id"),
        floor(lit(10000.0) *
          log(col("c12").cast("double") / col("c1").cast("double")))
          .cast("long").as("lp"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("lp")).as("sum_q"))
      .select(col("doc_id"), col("n_bigrams"), col("sum_q"),
        round(col("sum_q").cast("double") / col("n_bigrams").cast("double")
          / 10000.0, 4).as("avg_logp"))
  }
}
