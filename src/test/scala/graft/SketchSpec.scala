package graft

import org.apache.spark.sql.functions._

/** q55's gate proves the KMV set-algebra computation is deterministic and
  * cross-engine identical; this spec proves the ESTIMATES are actually
  * good — against the exact intersection/union/Jaccard computed from the
  * same data. The k-minimum-values estimator's relative error is
  * ~1/sqrt(k) (k = 64 → ~12.5% std), so a 3-sigma band is the assertion;
  * when the merged sketch holds the whole union (k_used < k) the
  * estimates must be EXACT. */
class SketchSpec extends SparkSpec {

  private def exactSets(dir: String): (Set[Long], Set[Long]) = {
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    def keys(p: Int) = li.filter(pmod(col("l_orderkey"), lit(2)) === p)
      .select(col("l_partkey")).distinct()
      .collect().map(_.getLong(0)).toSet
    (keys(0), keys(1))
  }

  for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
    test(s"q55 estimates vs exact set algebra at $dir") {
      val r = SparkEntry.queries("q55_sketch_intersect")(spark, dir).head()
      val kUsed = r.getAs[Long]("k_used")
      val unionEst = r.getAs[Double]("union_est")
      val interEst = r.getAs[Double]("inter_est")
      val jaccardEst = r.getAs[Double]("jaccard_est")
      val (a, b) = exactSets(dir)
      val union = (a ++ b).size.toDouble
      val inter = (a intersect b).size.toDouble
      if (kUsed < 64) {
        // sketch holds the whole union: estimates are definitionally exact
        // up to IEEE round-trip — inter_est = (n_common/k_used)*k_used
        // need not reproduce the integer bit-for-bit (e.g. (1/49)*49 != 1)
        assert(math.abs(unionEst - union) < 1e-9 &&
          math.abs(interEst - inter) < 1e-9 * math.max(inter, 1.0))
      } else {
        val sigma = 1.0 / math.sqrt(64.0)
        assert(math.abs(unionEst - union) <= 3 * sigma * union,
          s"union est $unionEst vs exact $union")
        // intersection compounds the Jaccard sample (binomial on k) with
        // the union estimate — allow the combined 3-sigma band
        val jSigma = math.sqrt(jaccardEst * (1 - jaccardEst) / 64.0) + 1e-9
        assert(math.abs(interEst - inter) <=
          (3 * jSigma / math.max(jaccardEst, 1e-9) + 3 * sigma) * math.max(inter, 1.0),
          s"inter est $interEst vs exact $inter")
      }
      assert(inter > 0, "audiences do not overlap — weak fixture")
    }
  }

  test("q55 exact branch: k_used < 64 on a tiny fixture") {
    import spark.implicits._
    // both testdata scales have >= 64 distinct part keys per audience, so
    // the exact-under-k branch was dead there (ADVICE r8): build a corpus
    // with 10 even-audience and 10 odd-audience keys (union 18, overlap 2)
    val dir = java.nio.file.Files.createTempDirectory("kmv_tiny").toString
    (1L to 60L)
      .map(i => (i, i % 20 + (i % 2) * 15))
      .toDF("l_orderkey", "l_partkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val r = SparkEntry.queries("q55_sketch_intersect")(spark, dir).head()
    val kUsed = r.getAs[Long]("k_used")
    val (a, b) = exactSets(dir)
    assert(kUsed < 64 && kUsed == (a ++ b).size.toLong,
      s"fixture failed to exercise the exact branch: k_used=$kUsed")
    val inter = (a intersect b).size.toDouble
    assert(inter > 0, "fixture audiences must overlap")
    assert(math.abs(r.getAs[Double]("union_est") - (a ++ b).size) < 1e-9)
    assert(math.abs(r.getAs[Double]("inter_est") - inter) < 1e-9 * inter)
  }
}
