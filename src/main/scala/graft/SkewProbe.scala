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
    // skewed assignment: half the corpus in cluster 0, the rest spread
    // over 60 small clusters — k=61 with a 60× biggest/smallest ratio.
    // k MATTERS here: at small k the uniform rule's B = ceil(sqrt(128/k))
    // is already large enough that the big cluster's B² tiles fill a
    // whole executor wave, and sizing buys nothing (measured: k=6, 5×
    // skew, 200k vectors — sized 254 s vs uniform 244 s, the extra
    // replication costing ~4%). The straggler regime is LARGE k, where
    // uniform B degrades to 1-2 and the big cluster becomes a handful of
    // huge tiles over idle cores — the s12/s13 deployment shape (k ∝ n)
    // meeting a natural skewed histogram.
    val assign = e.select(col("vec_id").as("id"),
      when(pmod(col("vec_id"), lit(120)) < 60, lit(0L))
        .otherwise(pmod(col("vec_id"), lit(120)) - 59).as("cluster"))
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
    // SKEW_CONFIGS=uniform|sized restricts; SPARK_GRAFT_STAGES=1 dumps the
    // last pass's stage profile + post-AQE plan (the BenchOne diagnostics)
    val want = sys.env.get("SKEW_CONFIGS")
      .map(_.split(",").map(_.trim).toSet)
      .getOrElse(Set("uniform", "sized"))
    final case class StageRow(id: Int, nm: String, wallMs: Long, taskMs: Long,
                              nTasks: Int)
    val stages = scala.collection.mutable.ArrayBuffer.empty[StageRow]
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val i = e.stageInfo
        val wall = (for {a <- i.completionTime; b <- i.submissionTime}
          yield a - b).getOrElse(0L)
        stages.synchronized {
          stages += StageRow(i.stageId, i.name.takeWhile(_ != '\n').take(50),
            wall, i.taskMetrics.executorRunTime, i.numTasks)
        }
      }
    }
    val profile = sys.env.contains("SPARK_GRAFT_STAGES")
    if (profile) spark.sparkContext.addSparkListener(listener)
    var counts = Map.empty[String, Long]
    var lastDf: org.apache.spark.sql.DataFrame = null
    for ((tag, blocks) <- Seq(("uniform", uniform), ("sized", sized))
           if want(tag);
         p <- 1 to passes) {
      val t0 = System.nanoTime()
      lastDf = sd.removals(sd.shadowPairsSized(m, blocks))
      val n = lastDf.count()
      println(f"$tag%-8s pass $p: ${(System.nanoTime() - t0) / 1e9}%.2f s  removals=$n")
      counts += tag -> n
    }
    require(counts.values.toSet.size == 1,
      s"pair sets diverged across configs: $counts")
    if (profile) {
      Thread.sleep(2000)
      println("stage profile (all passes, by wall time):")
      stages.synchronized(stages.sortBy(-_.wallMs).take(12)).foreach { s =>
        println(f"  stage ${s.id}%4d ${s.wallMs}%7d ms wall " +
          f"${s.taskMs}%8d ms task  ${s.nTasks}%4d tasks  ${s.nm}")
      }
      println("final executed plan (post-AQE):")
      println(lastDf.queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}
