package graft.jobs

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CorpusPipelineSpec extends SparkSpec {
  import spark.implicits._

  private def docs = spark.read.parquet(s"$sfSmoke/documents.parquet")
    .select(col("doc_id"), col("text"), col("source"))

  // eval set = the first 5 docs, like t17
  private def evalDocs = docs.filter(col("doc_id") < 5)
  private def trainDocs = docs.filter(col("doc_id") >= 5)

  test("stages shrink monotonically and the output is pack-consistent") {
    val (packed, summary) = CorpusPipeline.run(trainDocs, evalDocs)
    val counts = summary.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val order = Seq("0_input", "1_clean", "2_exact_dedup", "3_neardup_dedup",
      "4_decontaminated", "5_lm_filtered", "6_sampled", "7_packed")
    order.sliding(2).foreach { case Seq(a, b) =>
      assert(counts(b) <= counts(a), s"$b (${counts(b)}) > $a (${counts(a)})")
    }
    assert(counts("7_packed") == counts("6_sampled")) // packing drops nothing
    assert(counts("7_packed") > 0)
    // decontamination really dropped something on this corpus (docs 0-4's
    // grams overlap the word-soup corpus heavily)
    assert(counts("4_decontaminated") < counts("3_neardup_dedup"))
    // the perplexity tail cut really dropped the worst decile
    assert(counts("5_lm_filtered") < counts("4_decontaminated"))

    val rows = packed.select("doc_id", "n_tok", "shard", "bin", "offset")
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(rows.forall { case (id, _, shard, _, _) => id / 100 == shard })
    assert(rows.forall { case (_, _, _, bin, off) => bin >= 0 && off >= 0 && off < 256 })
    // within a shard: docs in id order fill bins contiguously
    rows.groupBy(_._3).foreach { case (_, xs) =>
      val sorted = xs.sortBy(_._1)
      var cum = 0L
      sorted.foreach { case (_, nTok, _, bin, off) =>
        assert(bin == cum / 256 && off == cum % 256)
        cum += nTok
      }
    }
  }

  test("the pipeline output contains no surviving near-dup pair") {
    val (packed, _) = CorpusPipeline.run(trainDocs, evalDocs)
    val surviving = graft.operators.NearDup
      .jaccardPairs(packed.select(col("doc_id"), col("text")))
      .count()
    assert(surviving == 0L, s"$surviving near-dup pairs survived dedup")
  }

  test("an empty post-clean corpus flows through without error (null percentile guard)") {
    // every doc fails the quality gate → stages 2-7 all see zero rows; the
    // LM stage's percentile returns NULL and must be guarded, not NPE
    val junk = Seq((100L, "x", "web"), (101L, "!!", "web"))
      .toDF("doc_id", "text", "source")
    val (packed, summary) = CorpusPipeline.run(junk, evalDocs)
    assert(packed.count() == 0L)
    val counts = summary.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts("0_input") == 2L && counts("1_clean") == 0L &&
      counts("7_packed") == 0L)
  }

  test("the ExactSubstr stage strips repeated spans and reports its count") {
    val cfg = CorpusPipeline.Config(exactSubstrMinGram = Some(5))
    val (packed, summary) = CorpusPipeline.run(trainDocs, evalDocs, cfg)
    val counts = summary.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.contains("3b_substr_strip"))
    assert(counts("3b_substr_strip") <= counts("3_neardup_dedup"))
    assert(counts("4_decontaminated") <= counts("3b_substr_strip"))
    assert(counts("7_packed") > 0)
    // the strip really removed repeated material: measure the repeated-span
    // token mass WITHIN each run's packed output. The default pipeline
    // retains corpus-level repeats; the stripped one may keep at most the
    // new-adjacency artifacts a one-pass strip can create.
    def spanMass(df: org.apache.spark.sql.DataFrame): Long =
      graft.operators.NearDup.repeatedSpans(
          df.select(col("doc_id"), col("text")), 5)
        .agg(coalesce(sum(col("end_tok") - col("start_tok")), lit(0L)))
        .head().getLong(0)
    val (packedDefault, _) = CorpusPipeline.run(trainDocs, evalDocs)
    val massDefault = spanMass(packedDefault)
    val massStripped = spanMass(packed)
    assert(massDefault > 0, "fixture lost its repeats; comparison is vacuous")
    assert(massStripped < massDefault,
      s"strip left $massStripped repeated-span tokens vs $massDefault without it")
  }

  test("deterministic: two runs produce identical corpora") {
    val (a, _) = CorpusPipeline.run(trainDocs, evalDocs)
    val (b, _) = CorpusPipeline.run(trainDocs, evalDocs)
    val ka = a.select("doc_id", "shard", "bin", "offset")
      .as[(Long, Long, Long, Long)].collect().toSet
    val kb = b.select("doc_id", "shard", "bin", "offset")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(ka == kb && ka.nonEmpty)
  }
}
