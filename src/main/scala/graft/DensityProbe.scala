package graft

import org.apache.spark.sql.functions._

/** Dev tool: measure the near-dup / semantic-dedup family under the
  * DENSITY-CONSTANT scaling regime (a `ScaleUp … distinct` surface, where
  * true dup pairs grow ∝ n rather than the dense surface's ∝ n·factor).
  *
  * `factor` is the distinct-mode replication factor of the surface
  * relative to the base corpus (1 for the base itself). t06's DF cap is a
  * corpus-FRACTION statistic, so the cap is scaled by 1/factor: under the
  * bijective word rename every gram family keeps its base document count
  * while the corpus is factor× larger, and cap/factor reproduces each
  * per-replica capped gram set bit-for-bit (ScaleUp's scaladoc records
  * the 206 → 33.9 M blow-up of measuring with the UNscaled cap). The
  * cap-free operators (t36 shingle LSH, s12 scaled semantic dedup) run
  * unmodified.
  *
  * Usage: DensityProbe <sfDir> <factor>   (prints one JSON line)
  */
object DensityProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val factor = args(1).toInt
    val spark = Bench.buildSession(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val docs = graft.core.Tables(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))

    def timed[A](body: => (Long, A)): (Double, Long, A) = {
      val t0 = System.nanoTime()
      val (n, a) = body
      ((System.nanoTime() - t0) / 1e9, n, a)
    }

    // t06 shape, cap scaled with the corpus
    val (t06Sec, t06Pairs, pairs) = timed {
      val p = graft.operators.NearDup.jaccardPairs(
        docs, gramLen = 4, capNum = 1, capDen = 10 * factor,
        tNum = 4, tDen = 5)
      (p.count(), p)
    }
    // t11 shape over those pairs
    val (t11Sec, t11Rows, _) = timed {
      val labels = graft.operators.Graph.connectedComponents(
        pairs.select(col("a_id"), col("b_id")))
      (labels.count(), ())
    }
    // t36 shape (cap-free)
    val (t36Sec, t36Pairs, _) = timed {
      (graft.operators.NearDup.selfMinHashPairs(docs).count(), ())
    }
    println(s"""{"metric":"density_probe","sf":"$sfDir","factor":$factor,""" +
      s""""t06_sec":$t06Sec,"t06_pairs":$t06Pairs,""" +
      s""""t11_sec":$t11Sec,"t11_rows":$t11Rows,""" +
      s""""t36_sec":$t36Sec,"t36_pairs":$t36Pairs}""")
    spark.stop()
  }
}
