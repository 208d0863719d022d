package graft

import org.apache.spark.sql.functions._

/** Perf probe for the SIZE-AWARE semdedup block factor
  * (VectorQueries.blocksBySize): on a deliberately SKEWED cluster
  * histogram — half the corpus in one cluster, the rest spread evenly —
  * time the within-cluster pair stage under (a) the round-11 uniform
  * block factor and (b) the per-cluster sized map, same exact pair set.
  *
  * Why a synthetic assignment: s11's own sf10 histogram is near-balanced
  * (22.0k–27.7k members per cluster, measured round 12), so the sized map
  * collapses to the uniform optimum there and the straggler effect the
  * sizing targets never shows. Real 100 TB corpora are NOT balanced —
  * k-means on natural text/embedding distributions routinely yields
  * order-of-magnitude cluster skew — so the lever is probed on the skewed
  * shape directly, with the assignment injected instead of trained.
  *
  * Usage: SkewProbe [sfDir] [passes]   (defaults /tmp/sf1, 2)
  * Prints per-config pass times and the derived maps.
  */
object SkewProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/tmp/sf1"
    val passes = if (args.length > 1) args(1).toInt else 2
    val spark = Bench.buildSession(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    graft.functions.VectorExpressions.register(spark)
    val e = graft.queries.Q.T(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding"))
    // skewed assignment: vec_id % 10 ∈ {0..4} → cluster 0 (50%), else
    // clusters 1..5 (10% each) — k=6 with a 5× biggest/smallest ratio
    val assign = e.select(col("vec_id").as("id"),
      when(pmod(col("vec_id"), lit(10)) < 5, lit(0L))
        .otherwise(pmod(col("vec_id"), lit(10)) - 4).as("cluster"))
    val sd = graft.operators.SemDedup
    val m = sd.members(e, assign).localCheckpoint()
    val sizes = graft.queries.VectorQueries.clusterSizes(assign)
    val sized = graft.queries.VectorQueries.blocksBySize(sizes)
    // round-11 rule: one B for every cluster, grid sized to ~128 tasks
    val k = sizes.size
    val uniformB = math.max(1, math.ceil(math.sqrt(128.0 / k)).toInt)
    val uniform = sizes.map { case (c, _) => c -> uniformB }.toMap
    println(s"sizes     ${sizes.sortBy(-_._2)}")
    println(s"uniform   B=$uniformB (${sizes.size * uniformB * uniformB} tiles)")
    println(s"sized     ${sized.toSeq.sortBy(_._1)} " +
      s"(${sized.values.map(b => b * b).sum} tiles)")
    var nUni = -1L; var nSized = -1L
    for ((tag, blocks) <- Seq(("uniform", uniform), ("sized", sized));
         p <- 1 to passes) {
      val t0 = System.nanoTime()
      val n = sd.removals(sd.shadowPairsSized(m, blocks)).count()
      println(f"$tag%-8s pass $p: ${(System.nanoTime() - t0) / 1e9}%.2f s  removals=$n")
      if (tag == "uniform") nUni = n else nSized = n
    }
    require(nUni == nSized, s"pair sets diverged: $nUni vs $nSized")
    spark.stop()
  }
}
