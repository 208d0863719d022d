package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Product quantization: code shape/determinism, exactness of the ADC
  * lookup expression against a scalar reference, and measured recall of
  * the ADC shortlist + exact re-rank against brute force. */
class PqSpec extends SparkSpec {

  private lazy val e = spark.read.parquet(s"$sfSmoke/embeddings.parquet")
  private lazy val cb = Pq.train(e, "vec_id", "embedding", m = 4, k = 16, iters = 3)
  private lazy val encoded = Pq.encode(e, "vec_id", "embedding", cb)

  private def quant(v: Array[Float]): Array[Long] =
    v.map(x => math.floor(x * 1000.0 + 0.5).toLong)

  private lazy val corpus: Map[Long, Array[Long]] =
    e.select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> quant(r.getSeq[Float](1).toArray)).toMap

  private def exactTop(q: Array[Long], k: Int): Seq[Long] =
    corpus.toSeq.map { case (id, v) =>
      (v.zip(q).map { case (a, b) => (a - b) * (a - b) }.sum, id)
    }.sorted.take(k).map(_._2)

  test("codes are m small ints, in range, deterministic") {
    val rows = encoded.collect().map(r => r.getLong(0) -> r.getSeq[Int](1))
    assert(rows.length == e.count())
    assert(rows.forall { case (_, cs) => cs.length == 4 && cs.forall(c => c >= 0 && c < 16) })
    // 64 floats (256 B) -> 4 ints: the compression that makes a 100 TB
    // candidate scan affordable
    val again = Pq.encode(e, "vec_id", "embedding", cb)
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(rows.toMap == again)
  }

  test("the ADC expression equals the scalar LUT sum row-by-row") {
    val qv = e.filter(col("vec_id") === 3).select(col("embedding"))
      .head().getSeq[Float](0).toArray
    val lut = Pq.lut(cb, qv)
    val got = Pq.adcScores(encoded, cb, qv)
      .select(col("vec_id"), col("codes"), col("adc_dist")).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val expected = r.getSeq[Int](1).zipWithIndex
        .map { case (c, s) => lut(s)(c) }.sum
      assert(r.getLong(2) == expected, s"vec ${r.getLong(0)}")
    }
  }

  test("ADC shortlist + exact re-rank recalls brute force") {
    val k = 10
    val recalls = Seq(3L, 7L, 11L).map { qid =>
      val qv = e.filter(col("vec_id") === qid).select(col("embedding"))
        .head().getSeq[Float](0).toArray
      val truth = exactTop(quant(qv), k).toSet
      val got = Pq.search(encoded, e, "vec_id", "embedding", cb, qv,
          topK = k, shortlist = 50)
        .collect().map(_.getLong(0)).toSet
      // the re-ranked top-k is exact WITHIN the shortlist, so recall here
      // measures only what the ADC shortlist missed
      truth.intersect(got).size.toDouble / k
    }
    val mean = recalls.sum / recalls.size
    info(f"PQ recall@$k (m=4, k*=16, shortlist=50): per-query $recalls mean $mean%.2f")
    assert(mean >= 0.7, s"recall collapsed: $recalls") // measured 0.80
    // rank 1 must be the query vector itself (distance 0 survives any
    // shortlist its own codes are nearest to)
    val self = Pq.search(encoded, e, "vec_id", "embedding", cb,
      e.filter(col("vec_id") === 3).select(col("embedding")).head()
        .getSeq[Float](0).toArray, topK = 1, shortlist = 50)
      .head().getLong(0)
    assert(self == 3L)
  }
}
