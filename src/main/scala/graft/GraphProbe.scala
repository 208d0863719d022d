package graft

import org.apache.spark.sql.functions._

/** Times [[graft.operators.Graph.triangleNodeCounts]] on the FULL
  * (unsampled) co-purchase graph of a surface — the standing head-to-head
  * datum behind q56's 1-in-3 gate sample (PERF.md: the full sf0.1 graph
  * is 1.2M edges over 20k parts, mean degree 120, ~40M oriented wedges).
  * The gated query samples to keep the BENCH total honest; this probe is
  * where the full-density number gets re-measured after operator changes.
  *
  * Usage: GraphProbe [sfDir] [passes] [spreadGate] [form] [localCap]
  *   (defaults /root/testdata/sf0.1, 3, the operator's 1e8 gate —
  *    pass 0 to force the wedge-spread exchange for A/B timing;
  *    form ∈ {sortedrun (default, Graph.coOccurrenceEdges), selfjoin,
  *    selfjoin_shj, coloc, collectset; prefix edges_ to time ONLY the
  *    edge build's count} — the standing A/B ladder behind the round-14
  *    edge-build decision, measurements pinned in coOccurrenceEdges;
  *    localCap ∈ {-1 = auto heap-derived (r15 local compact-forward
  *    rung — at sf0.1's 1.2M edges this IS the production path), 0 =
  *    force the distributed wedge plan (the pre-r15 A/B baseline)})
  */
object GraphProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val passes = if (args.length > 1) args(1).toInt else 3
    val gate = if (args.length > 2) args(2).toLong
      else graft.operators.Graph.wedgeSpreadGate
    val form = if (args.length > 3) args(3) else "pairs"
    val localCap = if (args.length > 4) args(4).toLong else -1L
    val spark = Bench.buildSession(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    for (p <- 1 to passes) {
      val t0 = System.nanoTime()
      val items = graft.queries.Q.T(spark, sfDir, "lineitem")
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
      def selfJoinEdges = {
        val d = items.distinct()
        d.as("x").join(d.as("y"),
            col("x.o") === col("y.o") && col("x.p") < col("y.p"))
          .select(col("x.p").as("a"), col("y.p").as("b")).distinct()
      }
      // self-join with SHJ hint: deletes the SMJ sorts, but per-partition
      // hash-building the 20M side measured WORSE than sorting (rejected)
      def selfJoinShjEdges = {
        val d = items.distinct()
        d.as("x").join(d.as("y").hint("shuffle_hash"),
            col("x.o") === col("y.o") && col("x.p") < col("y.p"))
          .select(col("x.p").as("a"), col("y.p").as("b")).distinct()
      }
      // collect_set + compiled UnorderedPairs kernel — the round-14
      // runner-up (object sort-agg churn loses to the sorted-run form
      // in-suite and at sf100d; kept as the standing A/B rung)
      def collectSetEdges = {
        graft.functions.GraphExpressions.register(spark)
        items.groupBy(col("o"))
          .agg(collect_set(col("p")).as("ids"))
          .select(explode(
            graft.functions.GraphExpressions.unorderedPairs(col("ids"))).as("e"))
          .select(col("e.a").as("a"), col("e.b").as("b")).distinct()
      }
      // colocated candidate: ONE exchange on o satisfies both the (o,p)
      // dedup (ClusteredDistribution subset rule) and the self-join's
      // clustering — all-codegen, but the double dedup-agg + SHJ build
      // measured worst of the ladder (rejected)
      def colocEdges = {
        val d = items.repartition(col("o")).dropDuplicates("o", "p")
        d.as("x").join(d.as("y").hint("shuffle_hash"),
            col("x.o") === col("y.o") && col("x.p") < col("y.p"))
          .select(col("x.p").as("a"), col("y.p").as("b")).distinct()
      }
      val edges =
        if (form.endsWith("selfjoin")) selfJoinEdges
        else if (form.endsWith("selfjoin_shj")) selfJoinShjEdges
        else if (form.endsWith("coloc")) colocEdges
        else if (form.endsWith("collectset")) collectSetEdges
        else graft.operators.Graph.coOccurrenceEdges(items, "o", "p")
      if (form.startsWith("edges_")) {
        val n = edges.count()
        println(f"pass $p: ${(System.nanoTime() - t0) / 1e9}%.2f s  " +
          s"edges=$n ($form)")
      } else {
        val top = graft.operators.Graph
          .triangleNodeCounts(edges, spreadGate = gate,
            localEdgeThreshold = localCap)
          .orderBy(col("n_tri").desc, col("node").asc).limit(10)
          .collect()
        println(f"pass $p: ${(System.nanoTime() - t0) / 1e9}%.2f s  " +
          s"top=${top.take(3).map(r => (r.get(0), r.get(1))).mkString(",")}")
      }
    }
    spark.stop()
  }
}
