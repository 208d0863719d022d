package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed BPE (byte-pair-encoding) merge training — the tokenizer-
  * vocabulary step of an LLM data pipeline (Sennrich et al. 2016).
  *
  * Design: a WORD is BPE's natural locality unit — merges never cross word
  * boundaries — so the corpus is held as one row per word, its symbol
  * sequence a ' '-separated STRING (symbols are merged character runs and
  * never contain the separator; the string form is ~10× smaller than an
  * array of one-char UTF8Strings, which is what the per-round cache and
  * every scan pays for). Each round is:
  *   1. global pair count: one codegen kernel explode
  *      ([[graft.functions.TextExpressions.BpeSymPairs]]) + one
  *      partial-aggregable groupBy (uniform pair keys — the only shuffle);
  *   2. argmax pair (count desc, then lexicographic — deterministic),
  *      a TakeOrdered(1) driver scalar like KMeans' centroid pull;
  *   3. merge application: MAP-ONLY — the codegen kernel
  *      [[graft.functions.TextExpressions.BpeMergeApply]] rewrites each
  *      word's string in place (leftmost-nonoverlapping greedy, a,a,a →
  *      (aa),a, no re-merge of freshly formed symbols within a round).
  * Rounds are inherently sequential (round k+1 counts the corpus AS
  * REWRITTEN by round k) — that is BPE, not a plan artifact; production
  * trainers amortize by batching merges, and each batch's re-count has
  * exactly this one-shuffle shape.
  *
  * Two earlier engine formulations were measured and replaced: per-CHAR
  * relational rows (lead-window adjacency + gaps-and-islands overlap
  * chains + anti-join deletes: 3 shuffles/round, 11–12.5 s at sf0.1) and
  * per-word ARRAY state (HOF pair explode + array cache: 3.5 s sf0.1 /
  * 29 s sf1). The DuckDB oracle (t33) still USES the relational
  * formulation, so the gate proves two independent constructions of the
  * greedy-merge semantics agree; BpeSpec additionally pins the kernels
  * against a sequential plain-Scala reference on overlap chains, ties,
  * and multichar-symbol rounds.
  */
object Bpe {

  /** One row per word: (doc_id, word_idx, syms = chars joined by ' ').
    * The empty-word filter guards split's keep-empty tokens (double or
    * leading spaces). */
  def wordSyms(docs: DataFrame, idCol: String = "doc_id",
               textCol: String = "text"): DataFrame =
    docs
      .select(col(idCol).as("doc_id"),
        posexplode(split(col(textCol), " ")).as(Seq("word_idx", "word")))
      .filter(length(col("word")) >= 1)
      .select(col("doc_id"), col("word_idx").cast("long").as("word_idx"),
        expr("array_join(transform(sequence(1, length(word)), " +
          "i -> substr(word, i, 1)), ' ')").as("syms"))

  /** One merge round over (doc_id, word_idx, syms) rows. `None` when no
    * adjacent pair remains anywhere in the corpus (every word fully merged
    * to a single symbol) — the caller stops early with the merges found so
    * far rather than failing partway.
    * @return Some(rewritten rows, (lhs, rhs, pairCount)), or None */
  def mergeRound(rows: DataFrame): Option[(DataFrame, (String, String, Long))] = {
    graft.functions.TextExpressions.register(rows.sparkSession)
    val pairs = rows.select(explode(
      graft.functions.TextExpressions.bpeSymPairs(col("syms"))).as("p"))
    // the pair string is `a + ' ' + b` with exactly one separator, so the
    // (count desc, a asc, b asc) argmax splits it back for the tie-break
    val bestRow = pairs.groupBy(col("p")).agg(count(lit(1)).as("c"))
      .select(col("c"), element_at(split(col("p"), " "), 1).as("a"),
        element_at(split(col("p"), " "), 2).as("b"))
      .orderBy(col("c").desc, col("a").asc, col("b").asc)
      .limit(1).collect()
    bestRow.headOption.map { best =>
      val (a, b, c) = (best.getString(1), best.getString(2), best.getLong(0))
      val rewritten = rows.select(col("doc_id"), col("word_idx"),
        graft.functions.TextExpressions.bpeMerge(col("syms"), a, b).as("syms"))
      (rewritten, (a, b, c))
    }
  }

  /** Train `rounds` merges; returns the merge table
    * (round, lhs, rhs, merged, pair_count, n_rows_after) — lhs/rhs, not
    * left/right: SQL keywords on the oracle surface; n_rows_after is the
    * corpus-wide symbol count after applying the round's merge
    * (separators + 1 per word — a length difference, no re-split). The
    * corpus is re-persisted per round and the previous round's cache
    * released — each round's lineage would otherwise recompute every
    * prior round (measured 23% slower even at rounds = 3). */
  def train(docs: DataFrame, rounds: Int,
            idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    var rows = wordSyms(docs, idCol, textCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // stops early (merge table shorter than `rounds`) once no adjacent
    // pair remains — small corpora exhaust their mergeable depth
    val merges = Iterator.range(1, rounds + 1)
      .map(r => (r, mergeRound(rows)))
      .takeWhile(_._2.isDefined)
      .map { case (r, m) =>
        val (next, (a, b, c)) = m.get
        val pinned = next.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val n = pinned
          .agg(sum(length(col("syms")) -
            length(translate(col("syms"), " ", "")) + 1L))
          .head().getLong(0)
        rows.unpersist(false)
        rows = pinned
        (r.toLong, a, b, a + b, c, n)
      }.toVector
    rows.unpersist(false)
    import spark.implicits._
    merges.toDF("round", "lhs", "rhs", "merged", "pair_count", "n_rows_after")
  }

  /** Encode the corpus with `rounds` freshly trained merges and emit
    * per-doc token statistics — the apply half of the tokenizer story
    * (train picks the vocabulary; this is what the pipeline runs on every
    * document thereafter). Deliberately cache-free: each round's argmax
    * re-derives the corpus through map-only kernel passes (Σ rounds cheap
    * maps — for a gate-sized `rounds` that beats pinning the intermediate
    * corpus for the session, and the operator leaves no persisted state
    * behind). Output: (doc_id, n_tokens, n_unique_tokens) after all
    * merges. Oracle-gated as t34 against the relational formulation's
    * final corpus state. */
  def encodeStats(docs: DataFrame, rounds: Int,
                  idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    var rows = wordSyms(docs, idCol, textCol)
    Iterator.range(0, rounds)
      .map(_ => mergeRound(rows))
      .takeWhile(_.isDefined)
      .foreach { m => rows = m.get._1 }
    rows.select(col("doc_id"), explode(split(col("syms"), " ")).as("sym"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        countDistinct(col("sym")).as("n_unique_tokens"))
  }
}
