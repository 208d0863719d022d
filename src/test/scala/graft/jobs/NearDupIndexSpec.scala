package graft.jobs

import java.nio.file.Files
import graft.SparkSpec

/** The disk-backed near-dup index must (1) reproduce the in-session
  * incremental operator's pairs on the first append (both freeze the
  * dictionary on the build corpus), (2) accumulate state so a later batch
  * pairs against EARLIER batches, not just the build corpus, and (3) keep
  * the frozen-dictionary semantics across appends (reference recomputed
  * from scratch in plain Scala). */
class NearDupIndexSpec extends SparkSpec {
  import spark.implicits._

  private def grams(text: String, n: Int): Set[String] =
    if (text.length < n) Set.empty
    else (0 to text.length - n).map(i => text.substring(i, i + n)).toSet

  /** frozen-dictionary reference: dictionary (DF cap) from `base` ONLY;
    * pairs over stored ∪ fresh with >= 1 fresh member */
  private def ref(base: Seq[(Long, String)], stored: Seq[(Long, String)],
                  fresh: Seq[(Long, String)], n: Int,
                  capNum: Int, capDen: Int, t: Double): Set[(Long, Long)] = {
    val baseSets = base.map { case (id, tx) => id -> grams(tx, n) }
    val df = baseSets.flatMap(_._2).groupBy(identity).map { case (g, v) => g -> v.size }
    val keep = df.filter { case (_, d) => d * capDen <= base.size * capNum }.keySet
    val all = (stored ++ fresh).map { case (id, tx) => id -> grams(tx, n).intersect(keep) }
    val freshIds = fresh.map(_._1).toSet
    (for {
      (a, ga) <- all
      (b, gb) <- all
      if a < b && (freshIds(a) || freshIds(b)) && ga.nonEmpty && gb.nonEmpty
      inter = ga.intersect(gb).size
      j = inter.toDouble / (ga.size + gb.size - inter).toDouble
      if j >= t
    } yield (a, b)).toSet
  }

  test("build + two appends: pairs accumulate under the frozen dictionary") {
    val baseTexts = Seq(
      "the rapid data engine shuffles partitions across many executors",
      "columnar scans prune row groups before any exchange happens here",
      "watermarks bound streaming state while windows aggregate events",
      "broadcast joins ship the small side to every worker task once",
      "catalyst rewrites logical plans into efficient physical operators")
    val base = baseTexts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val b1 = Seq(100L -> (baseTexts(0) + " zq"), // near-dup of doc 0
      101L -> "completely fresh content sharing nothing with anyone")
    val b2 = Seq(200L -> (baseTexts(0) + " zr"), // near-dup of 0 AND of 100
      201L -> "another entirely unrelated document with novel words only")
    val path = Files.createTempDirectory("neardup_index").toString

    NearDupIndex.build(base.toDF("doc_id", "text"), path,
      gramLen = 4, capNum = 9, capDen = 10, tNum = 4, tDen = 5)

    // first append: both the index and the in-session operator freeze the
    // dictionary on the build corpus, so they must agree exactly
    val p1 = NearDupIndex.append(spark, path, 1L, b1.toDF("doc_id", "text"))
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    val op1 = graft.operators.NearDup.incrementalJaccardPairs(
        base.toDF("doc_id", "text"), b1.toDF("doc_id", "text"),
        gramLen = 4, capNum = 9, capDen = 10, tNum = 4, tDen = 5)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(p1 == op1 && p1 == ref(base, base, b1, 4, 9, 10, 0.8))
    assert(p1.contains((0L, 100L)), s"first append missed the planted dup: $p1")

    // second append: b2 must pair against the build corpus AND batch 1 —
    // the stored state grew — still under the ORIGINAL dictionary
    val p2 = NearDupIndex.append(spark, path, 2L, b2.toDF("doc_id", "text"))
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    val want2 = ref(base, base ++ b1, b2, 4, 9, 10, 0.8)
    assert(p2 == want2, s"got $p2, want $want2")
    assert(p2.contains((100L, 200L)), "cross-batch pair missing: stored state did not grow")
    assert(p2.contains((0L, 200L)))
    // no re-emission of batch-1 pairs and nothing old×old
    assert(p2.forall { case (a, b) => a >= 200L || b >= 200L })

    // crash/replay: re-delivering batch 1 AFTER batch 2 landed reproduces
    // its original pairs exactly — the stored side is `ingest_batch <= 1`,
    // so batch 2 is invisible, and the partition overwrite leaves no
    // duplicate doc sets behind
    val p1r = NearDupIndex.append(spark, path, 1L, b1.toDF("doc_id", "text"))
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(p1r == p1, s"replayed batch 1 diverged: $p1r vs $p1")
    assert(spark.read.parquet(s"$path/docsets").count() ==
      (base.size + b1.size + b2.size).toLong, "replay duplicated doc sets")

    // compact folds the three batches into one partition; a post-compact
    // append still pairs against everything under the frozen dictionary
    assert(NearDupIndex.compact(spark, path) == Seq(1L, 2L))
    val batches = spark.read.parquet(s"$path/docsets")
      .selectExpr("cast(ingest_batch as long)").distinct()
      .collect().map(_.getLong(0)).toSeq.sorted
    assert(batches == Seq(0L))
    val b3 = Seq(300L -> (baseTexts(0) + " zs"))
    val p3 = NearDupIndex.append(spark, path, 3L, b3.toDF("doc_id", "text"))
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(p3 == ref(base, base ++ b1 ++ b2, b3, 4, 9, 10, 0.8),
      s"post-compact append diverged: $p3")
    assert(p3.contains((0L, 300L)) && p3.contains((100L, 300L))
      && p3.contains((200L, 300L)), s"post-compact pairs incomplete: $p3")
  }
}
