package graft.operators

import scala.collection.mutable
import graft.SparkSpec

/** The relational (gaps-and-islands) BPE merge must equal a SEQUENTIAL
  * greedy reference — leftmost-nonoverlapping application per word, the
  * chosen pair being the global max count with lexicographic tie-break —
  * on corpora with overlap chains (aaa/aaaa), ties, and multi-round
  * dependence (round k+1 counts the round-k rewrite). */
class BpeSpec extends SparkSpec {

  /** sequential reference: per round, (lhs, rhs, pair_count, n_rows_after) */
  private def refTrain(texts: Seq[String], rounds: Int): Seq[(String, String, Long, Long)] = {
    var ws: Seq[mutable.ArrayBuffer[String]] = texts
      .flatMap(_.split(" ", -1)).filter(_.nonEmpty)
      .map(w => mutable.ArrayBuffer(w.map(_.toString): _*))
    (1 to rounds).map { _ =>
      val counts = mutable.Map[(String, String), Long]()
      ws.foreach { w =>
        var i = 0
        while (i + 1 < w.length) {
          counts((w(i), w(i + 1))) = counts.getOrElse((w(i), w(i + 1)), 0L) + 1
          i += 1
        }
      }
      val ((a, b), c) = counts.toSeq
        .sortBy { case ((x, y), n) => (-n, x, y) }.head
      ws = ws.map { w =>
        val out = mutable.ArrayBuffer[String]()
        var i = 0
        while (i < w.length) {
          if (i + 1 < w.length && w(i) == a && w(i + 1) == b) {
            out += (a + b); i += 2
          } else { out += w(i); i += 1 }
        }
        out
      }
      (a, b, c, ws.map(_.size.toLong).sum)
    }
  }

  private def check(texts: Seq[String], rounds: Int): Unit = {
    import spark.implicits._
    val got = Bpe.train(
        texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
          .toDF("doc_id", "text"), rounds)
      .orderBy("round").collect()
      .map(r => (r.getString(1), r.getString(2), r.getLong(4), r.getLong(5)))
      .toSeq
    val want = refTrain(texts, rounds)
    assert(got == want, s"got $got, want $want")
  }

  test("overlap chains: aaa merges leftmost-nonoverlapping, not all pairs") {
    // (a,a) dominates; aaaa -> aa|aa, aaa -> aa|a
    check(Seq("aaaa aaa aa", "aa aaaa"), rounds = 3)
  }

  test("multi-round dependence on a mixed corpus") {
    check(Seq(
      "the cat sat on the mat",
      "the bat and the rat chat",
      "that hat is the fat cat hat",
      "banana bandana banana"), rounds = 5)
  }

  test("tie-break is lexicographic on the pair") {
    // every adjacent pair occurs exactly once -> the lexicographically
    // smallest pair must win round 1 in both implementations
    check(Seq("zyx", "wvu"), rounds = 2)
  }

  test("merged symbols chain across rounds (multichar lhs/rhs)") {
    // round 1: (a,b) -> ab everywhere; round 2: (ab,ab) has an overlap
    // chain in abababab -> abab|abab
    check(Seq("abababab ab abab", "ababab"), rounds = 3)
  }

  test("trainFromCounts: distributed rung == local rung (r16 size ladder)") {
    import spark.implicits._
    // every reference corpus above takes the LOCAL rung by default (tiny
    // vocab); localVocabThreshold = 0 forces the distributed loop on the
    // same histograms — the full merge tables must match column for column
    val corpora = Seq(
      Seq("aaaa aaa aa", "aa aaaa"),
      Seq("the cat sat on the mat", "the bat and the rat chat",
        "that hat is the fat cat hat", "banana bandana banana"),
      Seq("abababab ab abab", "ababab"),
      Seq("ab ab")) // exhausts after one round
    for (texts <- corpora) {
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val wc = Bpe.wordCounts(df)
      val local = Bpe.trainFromCounts(wc, 4).orderBy("round").collect().toSeq
      val dist = Bpe.trainFromCounts(wc, 4, localVocabThreshold = 0L)
        .orderBy("round").collect().toSeq
      assert(local == dist, s"rungs diverged on $texts: $local vs $dist")
    }
  }

  test("train stops early when the corpus runs out of mergeable pairs") {
    import spark.implicits._
    // "ab ab" has exactly 1 mergeable depth; asking for 5 rounds must
    // return the 1 merge found, not throw partway (ADVICE r8)
    val df = Seq((0L, "ab ab")).toDF("doc_id", "text")
    val merges = Bpe.train(df, rounds = 5).orderBy("round").collect()
    assert(merges.length == 1)
    assert(merges(0).getString(1) == "a" && merges(0).getString(2) == "b")
    // the exhausted exit derives n_rows_after = sumCnt without a length-sum
    // job (r15 ADVICE): both occurrences fully merged to one symbol each
    assert(merges(0).getLong(5) == 2L)
    // encodeStats on the same exhausted corpus must also degrade gracefully
    val stats = Bpe.encodeStats(df, rounds = 5).collect()
    assert(stats.length == 1 && stats(0).getLong(1) == 2L)
    // a corpus of single-char words has NO pairs at all -> empty merge table
    val none = Bpe.train(Seq((0L, "a b c")).toDF("doc_id", "text"), rounds = 2)
    assert(none.collect().isEmpty)
  }
}
