package graft.jobs

import java.nio.file.Files
import graft.SparkSpec
import graft.operators.Bpe

/** The incremental BPE vocab refresh must be EXACT: after any slicing of
  * the corpus into arrival batches, the refreshed merge table equals a
  * from-scratch Bpe.train over the union — because the stored word
  * histogram is additive and training is a pure function of it. Also pins
  * the histogram formulation itself (trainFromCounts == per-occurrence
  * train path == the t33-gated semantics). */
class BpeVocabIndexSpec extends SparkSpec {

  private val corpus = Seq(
    "the cat sat on the mat",
    "the bat and the rat chat",
    "that hat is the fat cat hat",
    "banana bandana banana",
    "abababab ab abab",
    "aaaa aaa aa",
    "the quick brown fox jumps over the lazy dog")

  private def df(texts: Seq[(Long, String)]) = {
    import spark.implicits._
    texts.toDF("doc_id", "text")
  }

  private def table(d: org.apache.spark.sql.DataFrame) =
    d.orderBy("round").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3),
        r.getLong(4), r.getLong(5))).toSeq

  private val all = corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }

  test("refresh after sliced arrival equals from-scratch training — two slicings") {
    val want = table(Bpe.train(df(all), rounds = 4))
    for ((name, slices) <- Seq(
      ("by-thirds", Seq(all.take(2), all.slice(2, 5), all.drop(5))),
      ("interleaved", Seq(all.filter(_._1 % 3 == 0), all.filter(_._1 % 3 == 1),
        all.filter(_._1 % 3 == 2))))) {
      val dir = Files.createTempDirectory(s"bpe_idx_$name").toString
      BpeVocabIndex.build(df(slices.head), dir, rounds = 4)
      val last = slices.tail.zipWithIndex.map { case (s, i) =>
        BpeVocabIndex.refresh(spark, dir, i + 1L, df(s)) }.last
      assert(table(last) == want, s"slicing $name diverged")
      assert(table(BpeVocabIndex.merges(spark, dir)) == want)
      // crash/replay: re-delivering batch 1 after batch 2 landed overwrites
      // its own partition — the fold (and so the vocab) must NOT double-
      // count the replayed batch, which the old whole-histogram rewrite did
      BpeVocabIndex.refresh(spark, dir, 1L, df(slices(1)))
      assert(table(BpeVocabIndex.merges(spark, dir)) == want,
        s"replaying batch 1 under $name changed the vocabulary")
    }
  }

  test("stored histogram equals the corpus word counts after refreshes") {
    val dir = Files.createTempDirectory("bpe_idx_counts").toString
    BpeVocabIndex.build(df(all.take(3)), dir, rounds = 2)
    BpeVocabIndex.refresh(spark, dir, 1L, df(all.drop(3)))
    val stored = BpeVocabIndex.counts(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = all.flatMap(_._2.split(" ")).filter(_.nonEmpty)
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(stored == want)
  }

  test("trainFromCounts equals the per-occurrence mergeRound formulation") {
    // the pre-round-9 formulation, retained as mergeRound, re-run here as
    // the reference: identical argmax sequence, counts, and symbol totals
    import org.apache.spark.sql.functions._
    var rows = Bpe.wordSyms(df(all))
    val ref = (1 to 4).flatMap { r =>
      Bpe.mergeRound(rows).map { case (next, (a, b, c)) =>
        rows = next
        val n = rows.agg(sum(length(col("syms")) -
          length(translate(col("syms"), " ", "")) + 1L)).head().getLong(0)
        (r.toLong, a, b, a + b, c, n)
      }
    }
    assert(table(Bpe.train(df(all), rounds = 4)) == ref)
  }
}
