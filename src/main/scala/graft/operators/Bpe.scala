package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed BPE (byte-pair-encoding) merge training — the tokenizer-
  * vocabulary step of an LLM data pipeline (Sennrich et al. 2016).
  *
  * Design: a WORD is BPE's natural locality unit — merges never cross word
  * boundaries — so the corpus is held as one row per word with its symbol
  * ARRAY, and each round is:
  *   1. global pair count: one explode of adjacent pairs + one
  *      partial-aggregable groupBy (uniform pair keys — the only shuffle);
  *   2. argmax pair (count desc, then lexicographic — deterministic),
  *      a TakeOrdered(1) driver scalar like KMeans' centroid pull;
  *   3. merge application: MAP-ONLY — the native codegen kernel
  *      [[graft.functions.TextExpressions.BpeMergeApply]] rewrites each
  *      word's array in place (leftmost-nonoverlapping greedy, a,a,a →
  *      (aa),a, no re-merge of freshly formed symbols within a round).
  * Rounds are inherently sequential (round k+1 counts the corpus AS
  * REWRITTEN by round k) — that is BPE, not a plan artifact; production
  * trainers amortize by batching merges, and each batch's re-count has
  * exactly this one-shuffle shape.
  *
  * An earlier all-relational formulation (char-level rows, lead windows
  * for adjacency, gaps-and-islands for overlap chains, anti-join deletes)
  * was measured at 3 shuffles/round over per-CHAR rows — the per-word
  * kernel form runs the same semantics at per-WORD row count with one
  * shuffle. The DuckDB oracle (t33) still USES the relational
  * formulation, so the gate proves two independent constructions of the
  * greedy-merge semantics agree; BpeSpec additionally pins the kernel
  * against a sequential plain-Scala reference on overlap chains, ties,
  * and multichar-symbol rounds.
  */
object Bpe {

  /** One row per word: (doc_id, word_idx, syms = array of 1-char symbols).
    * The empty-word filter guards split's keep-empty tokens (double or
    * leading spaces). */
  def wordSyms(docs: DataFrame, idCol: String = "doc_id",
               textCol: String = "text"): DataFrame =
    docs
      .select(col(idCol).as("doc_id"),
        posexplode(split(col(textCol), " ")).as(Seq("word_idx", "word")))
      .filter(length(col("word")) >= 1)
      .select(col("doc_id"), col("word_idx").cast("long").as("word_idx"),
        expr("transform(sequence(1, length(word)), i -> substr(word, i, 1))")
          .as("syms"))

  /** One merge round over (doc_id, word_idx, syms) rows.
    * @return (rewritten rows, (lhs, rhs, pairCount)) */
  def mergeRound(rows: DataFrame): (DataFrame, (String, String, Long)) = {
    graft.functions.TextExpressions.register(rows.sparkSession)
    // adjacent pairs, guarded against sequence(1, 0) counting down on
    // single-symbol words
    val pairs = rows.select(explode(expr(
        """CASE WHEN size(syms) >= 2
             THEN transform(sequence(1, size(syms) - 1),
                    i -> struct(syms[i - 1] AS a, syms[i] AS b))
             ELSE array() END""")).as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"))
    val bestRow = pairs.groupBy(col("a"), col("b")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("a").asc, col("b").asc)
      .limit(1).collect()
    require(bestRow.nonEmpty, "corpus has no adjacent pairs left")
    val (a, b, c) =
      (bestRow(0).getString(0), bestRow(0).getString(1), bestRow(0).getLong(2))
    val rewritten = rows.select(col("doc_id"), col("word_idx"),
      graft.functions.TextExpressions.bpeMerge(col("syms"), a, b).as("syms"))
    (rewritten, (a, b, c))
  }

  /** Train `rounds` merges; returns the merge table
    * (round, lhs, rhs, merged, pair_count, n_rows_after) — lhs/rhs, not
    * left/right: SQL keywords on the oracle surface; n_rows_after is the
    * corpus-wide symbol count after applying the round's merge. The
    * corpus is re-persisted per round and the previous round's cache
    * released — each round's lineage would otherwise recompute every
    * prior round. */
  def train(docs: DataFrame, rounds: Int,
            idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    var rows = wordSyms(docs, idCol, textCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val merges = (1 to rounds).map { r =>
      val (next, (a, b, c)) = mergeRound(rows)
      val pinned = next.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val n = pinned.agg(sum(size(col("syms")))).head().getLong(0)
      rows.unpersist(false)
      rows = pinned
      (r.toLong, a, b, a + b, c, n)
    }
    rows.unpersist(false)
    import spark.implicits._
    merges.toDF("round", "lhs", "rhs", "merged", "pair_count", "n_rows_after")
  }
}
