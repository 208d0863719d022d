package graft.jobs

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.{Graph, NearDup}

/** The training-data side's MainDag: one composed corpus pipeline
  * clean → exact dedup → near-dup cluster dedup → eval-set decontamination
  * → bigram-LM perplexity filter → per-source token-budget sampling →
  * sequence packing, reusing the same operators the oracle queries
  * exercise individually (t10/t05/t11-t14/t17/t18/t19/t24 semantics).
  *
  * Every stage is a pure DataFrame transform; the composition stays lazy
  * except the near-dup clustering (operators/Graph materializes its
  * fixpoint). The two expensive cuts (post-dedup, post-decontamination)
  * are persisted while the summary counts materialize and released before
  * returning; the returned corpus is itself cached — the caller unpersists
  * it when done.
  *
  * Scale notes: each stage keeps the shapes proven by its operator query —
  * hash-groupBy dedup, inverted-index near-dup (never doc×doc), broadcast
  * eval grams, bounded per-source windows. The pipeline's only driver-side
  * data are the dup-cluster labels (bounded by dup density) and the stage
  * summary.
  */
object CorpusPipeline {

  final case class Config(
      minTokens: Long = 10L,
      maxTokens: Long = 200L,
      minAlphaRatio: Double = 0.81,
      asciiOnly: Boolean = true,
      /** drop a train doc sharing at least this many word-3-grams with eval */
      decontamMinShared: Long = 5L,
      /** when set, strip exact repeated substrings of this many tokens
        * (NearDup.stripRepeatedSpans — the ExactSubstr pass) after the
        * near-dup cut; docs falling under minTokens afterwards drop */
      exactSubstrMinGram: Option[Int] = None,
      /** drop the worst-scoring fraction under the corpus bigram LM (the
        * CCNet-style perplexity tail cut; 0.0 disables the stage) */
      lmDropFraction: Double = 0.1,
      tokenBudgetPerSource: Long = 600L,
      packBudget: Long = 256L,
      shardSize: Long = 100L)

  /** Stage-1 quality gate (t10's rules), shared by the batch pipeline, the
    * streaming ingest (CorpusStream), and their specs — ONE definition so
    * the streaming admit set can never silently diverge from the batch one.
    * Adds `n_tok` and `alpha_ratio`, keeps rows passing the gates. */
  def clean(docs: DataFrame, cfg: Config = Config()): DataFrame =
    docs
      .withColumn("n_tok", size(split(col("text"), " ")).cast("long"))
      .withColumn("alpha_ratio",
        length(regexp_replace(col("text"), "[^a-z]", "")).cast("double") /
          length(col("text")).cast("double"))
      .filter(
        col("n_tok").between(cfg.minTokens, cfg.maxTokens) &&
          col("alpha_ratio") >= cfg.minAlphaRatio &&
          (if (cfg.asciiOnly) !col("text").rlike("[^\\x00-\\x7F]") else lit(true)))

  /** (packed corpus, per-stage doc counts). `docs` and `evalDocs` both need
    * (doc_id, text, source); eval docs are typically a separate, small set. */
  def run(docs: DataFrame, evalDocs: DataFrame,
          cfg: Config = Config()): (DataFrame, DataFrame) = {
    val spark = docs.sparkSession
    import spark.implicits._

    // 1. quality filter (t10's rules) + token count computed once
    val clean = this.clean(docs, cfg)

    // 2. exact dedup, keep-min doc_id per identical text (t05 semantics)
    val wFp = Window.partitionBy(md5(col("text"))).orderBy(col("doc_id"))
    val exact = clean.withColumn("__rn", row_number().over(wFp))
      .filter(col("__rn") === 1).drop("__rn")

    // 3. near-dup cluster dedup: Jaccard pairs -> connected components ->
    //    keep each cluster's min doc_id (t11/t14 semantics)
    val pairs = NearDup.jaccardPairs(exact.select(col("doc_id"), col("text")))
      .select(col("a_id"), col("b_id"))
    val losers = Graph.connectedComponents(pairs)
      .filter(col("id") =!= col("component"))
      .select(col("id").as("doc_id"))
    // cut the expensive prefix here: stages 4-6 and four summary counts
    // all read this frame, and without the persist each would re-run the
    // near-dup candidate join and clustering
    // losers/contaminated are corpus FRACTIONS, not bounded dims — no
    // broadcast hints; AQE broadcasts while they fit and shuffles beyond
    val deduped = exact.join(losers, Seq("doc_id"), "left_anti")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // 3b. optional ExactSubstr pass: cut repeated >=g-token spans from the
    //     surviving docs (one-pass, like Lee et al.'s practical variant),
    //     recompute token counts, re-apply the length floor. Runs AFTER
    //     near-dup dedup so cluster losers don't vote spans "repeated".
    val afterSubstr = cfg.exactSubstrMinGram match {
      case None => deduped
      case Some(g) =>
        val stripped = graft.operators.NearDup.stripRepeatedSpans(
          deduped.select(col("doc_id"), col("text")), g)
        deduped.drop("text", "n_tok")
          .join(stripped.withColumnRenamed("text_clean", "text"), Seq("doc_id"))
          .withColumn("n_tok", size(split(col("text"), " ")).cast("long"))
          .filter(col("n_tok") >= cfg.minTokens)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    }

    // 4. decontamination: drop train docs sharing >= minShared word-3-grams
    //    with the eval set (t17 semantics turned into a filter, via the
    //    SAME gram definition the oracle-proven query uses)
    def grams(d: DataFrame): DataFrame =
      NearDup.wordGrams(d.select(col("doc_id"), col("text")), 3)
    val evalGrams = grams(evalDocs).select(col("gram")).distinct()
    val contaminated = grams(afterSubstr)
      .join(broadcast(evalGrams), Seq("gram"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= cfg.decontamMinShared)
      .select(col("doc_id"))
    // second cut: the gram explode above is the next-most-expensive stage,
    // and stages 5-6, three summary counts, and the caller's consumption of
    // the returned frame all sit downstream of it
    val decontaminated = afterSubstr.join(contaminated, Seq("doc_id"), "left_anti")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // 5. LM perplexity filter (t24 semantics): score every doc under the
    //    corpus's own bigram model, drop the worst-scoring tail. The LM
    //    trains on the POST-dedup, post-decontamination cut — duplicated or
    //    contaminated text must not vote on what "typical" looks like. The
    //    cut threshold is ONE exact-percentile scalar brought to the driver
    //    (the blessed scalar-subquery shape); at warehouse scale swap in
    //    percentile_approx — the tail cut is approximate by nature.
    val lmFiltered =
      if (cfg.lmDropFraction <= 0.0) decontaminated
      else {
        // scores is consumed twice (percentile cut, then the semi-join
        // filter) and costs two corpus-wide groupBys plus a shuffle join —
        // pin it so the second consumer reads the cache, not the lineage
        val scores = graft.operators.LangModel.bigramScores(
          decontaminated.select(col("doc_id"), col("text")))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val cutRow = scores
          .agg(expr(s"percentile(avg_logp, ${cfg.lmDropFraction})"))
          .head()
        if (cutRow.isNullAt(0)) { // empty corpus: percentile is NULL
          scores.unpersist()
          decontaminated
        } else {
          val cut = cutRow.getDouble(0)
          val kept = decontaminated.join(
            scores.filter(col("avg_logp") >= cut).select(col("doc_id")),
            Seq("doc_id"), "left_semi")
            .localCheckpoint() // materialize, then the score cache can go
          scores.unpersist()
          kept
        }
      }

    // 6. per-source token budget (t19 semantics): md5-shuffle prefix
    val wSrc = Window.partitionBy(col("source"))
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val sampled = lmFiltered
      .withColumn("__cum", sum(col("n_tok")).over(wSrc))
      .filter(col("__cum") <= cfg.tokenBudgetPerSource)
      .drop("__cum")

    // 7. sequence packing (t18 semantics): shard-parallel greedy fill
    val wPack = Window
      .partitionBy(expr(s"doc_id div ${cfg.shardSize}"))
      .orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val packed = sampled
      .withColumn("shard", expr(s"doc_id div ${cfg.shardSize}"))
      .withColumn("start", sum(col("n_tok")).over(wPack) - col("n_tok"))
      .withColumn("bin", expr(s"start div ${cfg.packBudget}"))
      .withColumn("offset", col("start") % cfg.packBudget)
      .drop("start", "alpha_ratio")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    val summary = (Seq(
      "0_input" -> docs.count(),
      "1_clean" -> clean.count(),
      "2_exact_dedup" -> exact.count(),
      "3_neardup_dedup" -> deduped.count()) ++
      cfg.exactSubstrMinGram.map(_ =>
        "3b_substr_strip" -> afterSubstr.count()).toSeq ++ Seq(
      "4_decontaminated" -> decontaminated.count(),
      "5_lm_filtered" -> lmFiltered.count(),
      "6_sampled" -> sampled.count(),
      "7_packed" -> packed.count())
    ).toDF("stage", "n_docs")
    // the counts above materialized every cache; the returned `packed` is
    // itself cached, so the two upstream cuts can be released here — the
    // caller holds exactly one pinned frame and unpersists it when done
    deduped.unpersist()
    if (cfg.exactSubstrMinGram.nonEmpty) afterSubstr.unpersist()
    decontaminated.unpersist()
    (packed, summary)
  }
}
