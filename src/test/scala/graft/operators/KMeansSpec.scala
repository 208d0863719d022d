package graft.operators

import graft.SparkSpec

/** Checks the distributed Lloyd trainer against a plain-Scala reference
  * implementing the identical integer math (quantize → seed by lowest id →
  * assign by exact squared distance with lower-cluster tie-break → recenter
  * with the rational round-half-up), on a deterministic pseudo-random corpus
  * with planted cluster structure, for several iteration depths. */
class KMeansSpec extends SparkSpec {

  private val dim = 8

  /** deterministic corpus: 4 planted centers ± small noise, float-typed */
  private def corpus(n: Int): Seq[(Long, Array[Float])] = {
    val centers = Array(
      Array.fill(dim)(0.8f), Array.fill(dim)(-0.8f),
      Array.tabulate(dim)(i => if (i % 2 == 0) 0.8f else -0.8f),
      Array.tabulate(dim)(i => if (i < dim / 2) 0.6f else -0.2f))
    (0 until n).map { id =>
      val c = centers(id % 4)
      val v = Array.tabulate(dim) { i =>
        // LCG noise in [-0.05, 0.05), fully deterministic
        val h = (id * 1103515245L + i * 12345L + 7L) & 0x7fffffffL
        c(i) + ((h % 1000) / 10000.0f - 0.05f)
      }
      (id.toLong, v)
    }
  }

  private def quant(v: Array[Float]): Array[Long] =
    v.map(x => math.floor(x * 1000.0 + 0.5).toLong)

  /** reference Lloyd on quantized ints; returns final assignment map */
  private def refLloyd(rows: Seq[(Long, Array[Long])], k: Int,
                       iters: Int): Map[Long, (Long, Long)] = {
    var cents: Seq[(Long, Array[Long])] =
      rows.sortBy(_._1).take(k).zipWithIndex.map { case ((_, v), j) =>
        (j.toLong, v.clone())
      }
    def assign(cs: Seq[(Long, Array[Long])]): Map[Long, (Long, Long)] =
      rows.map { case (id, v) =>
        val best = cs.map { case (j, c) =>
          val d = v.zip(c).map { case (x, y) => (x - y) * (x - y) }.sum
          (d, j)
        }.min
        id -> (best._2, best._1)
      }.toMap
    for (_ <- 1 until iters) {
      val a = assign(cents)
      cents = rows.groupBy(r => a(r._1)._1).toSeq.map { case (j, members) =>
        val cnt = members.size
        val cv = Array.tabulate(members.head._2.length) { i =>
          val s = members.map(_._2(i)).sum
          math.floor((2.0 * s + cnt) / (2.0 * cnt)).toLong
        }
        (j, cv)
      }.sortBy(_._1)
    }
    assign(cents)
  }

  test("lloyd matches the scalar reference at iters=1,2,4") {
    import spark.implicits._
    val rows = corpus(120)
    val df = rows.toDF("vec_id", "embedding")
      .selectExpr("vec_id", "CAST(embedding AS array<float>) AS embedding")
    val qRows = rows.map { case (id, v) => (id, quant(v)) }
    for (iters <- Seq(1, 2, 4)) {
      val (assign, _) = KMeans.lloyd(df, "vec_id", "embedding", k = 4, iters)
      val got = assign.collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      assert(got == refLloyd(qRows, 4, iters), s"iters=$iters")
    }
  }

  test("lloyd recovers the 4 planted clusters") {
    import spark.implicits._
    val rows = corpus(120)
    val df = rows.toDF("vec_id", "embedding")
      .selectExpr("vec_id", "CAST(embedding AS array<float>) AS embedding")
    val (assign, cents) = KMeans.lloyd(df, "vec_id", "embedding", 4, 4)
    val byPlanted = assign.collect()
      .map(r => (r.getLong(0) % 4, r.getLong(1)))
      .groupBy(_._1).map { case (p, xs) => p -> xs.map(_._2).distinct }
    // every planted cluster maps to exactly one learned cluster, all distinct
    assert(byPlanted.values.forall(_.length == 1))
    assert(byPlanted.values.flatten.toSet.size == 4)
    assert(cents.count() == 4L * dim)
  }
}
