package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Distributed graph primitives needed by the training-data pipeline —
  * currently connected components, the canonical second stage of near-dup
  * deduplication (pair edges → duplicate clusters).
  */
object Graph {

  /** Connected components by min-label propagation with pointer jumping:
    * each round every node takes the min of its own label and its
    * neighbors' labels (BSP step), then follows its label one hop
    * (label := label-of-label, the pointer-jumping step). Neighbor
    * propagation alone is diameter-bound — a near-dup CHAIN of length d
    * needs d rounds — while the jump step halves the remaining chain depth
    * every round, so convergence is O(log d) rounds total.
    *
    * Scale shape: each round is two equi-joins + one groupBy over the EDGE
    * set only — nodes outside any edge never enter the computation; every
    * round's frame is localCheckpoint'ed so lineage stays one round deep
    * (superseded rounds' blocks are reclaimed by the ContextCleaner once
    * the driver drops its reference — not synchronously). The driver loop
    * carries no data, only the converged? counter — the standard
    * iterative-algorithm shape on Spark (same as GraphX/Pregel CC).
    *
    * @param edges two-column DataFrame of undirected edges
    * @param localEdgeThreshold edge count at or below which a driver-side
    *   union-find replaces the BSP loop (stats-driven strategy choice)
    * @return (id, component) — component = min node id reachable
    */
  def connectedComponents(
      edges: DataFrame,
      localEdgeThreshold: Long = 1L << 20): DataFrame = {
    val Array(srcCol, dstCol) = edges.columns
    val lvl = StorageLevel.MEMORY_AND_DISK
    val e2 = edges
      .select(col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"))
      .persist(lvl)
    // size-adaptive strategy, the same stats-driven choice a broadcast join
    // makes: a near-dup edge set is usually orders of magnitude smaller
    // than the corpus, and below the threshold a driver-side union-find
    // finishes in one collect instead of log(diameter) BSP rounds each
    // paying the per-job scheduling floor. Above it, the distributed BSP
    // path below handles edge sets that never fit one machine.
    val n = e2.count()
    if (n <= localEdgeThreshold) {
      val parent = scala.collection.mutable.HashMap.empty[Long, Long]
      def find(x: Long): Long = {
        var r = x
        while (parent.getOrElse(r, r) != r) r = parent(r)
        var c = x
        while (parent.getOrElse(c, c) != r) { val nx = parent(c); parent(c) = r; c = nx }
        r
      }
      e2.collect().foreach { row =>
        val a = row.getLong(0); val b = row.getLong(1)
        val ra = find(a); val rb = find(b)
        // min root wins, so every tree's root is its component minimum
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
        parent.getOrElseUpdate(math.min(ra, rb), math.min(ra, rb))
      }
      val out = parent.keysIterator.map(id => (id, find(id))).toSeq.sorted
      e2.unpersist()
      val spark = edges.sparkSession
      import spark.implicits._
      return out.toDF("id", "component")
    }
    val sym = e2
      .unionByName(e2.select(col("dst").as("src"), col("src").as("dst")))
      .persist(lvl)
    // localCheckpoint each round: the new label frame references the old
    // one several times (neighbor step + jump step), so carrying logical
    // lineage across rounds would grow the plan exponentially and drown
    // the driver in analysis time — the canonical iterative-DataFrame
    // trap. Checkpointing materializes the round into block storage and
    // makes the next round's plan start from a leaf.
    var labels = sym.select(col("src").as("id")).distinct()
      .withColumn("label", col("id"))
      .localCheckpoint(true)
    var changed = 1L
    var rounds = 0
    while (changed > 0 && rounds < 64) {
      val prop = sym
        .join(labels.select(col("id").as("dst"), col("label").as("nl")), Seq("dst"))
        .groupBy(col("src")).agg(min(col("nl")).as("min_nbr"))
        .select(col("src").as("id"), col("min_nbr"))
      val stepped = labels.select(col("id"), col("label").as("old"))
        .join(prop, Seq("id"), "left")
        .select(col("id"), col("old"),
          least(col("old"), coalesce(col("min_nbr"), col("old"))).as("l1"))
      // pointer jump: labels always point at real node ids, and label(l)
      // is monotonically <= l, so one extra self-join halves chain depth
      val next = stepped
        .join(stepped.select(col("id").as("l1"), col("l1").as("l2")), Seq("l1"), "left")
        .select(col("id"), col("old"),
          least(col("l1"), coalesce(col("l2"), col("l1"))).as("label"))
        .localCheckpoint(true)
      changed = next.filter(col("label") =!= col("old")).count()
      labels = next.select(col("id"), col("label"))
      rounds += 1
    }
    sym.unpersist()
    e2.unpersist()
    labels.select(col("id"), col("label").as("component"))
  }

  /** Quantized PageRank — link-based quality seeding (the CCNet/Common
    * Crawl idea: rank pages by the link graph, seed document quality from
    * the rank). The recurrence runs in EXACT integer micro-units,
    *   pr' = 150000 + (85 · Σ_incoming (pr div outdeg)) div 100
    * (damping 0.85, base 0.15, unit 1e6), so — unlike float PageRank,
    * whose partial sums differ by reduction order — every iteration is
    * bit-identical at any partition count and cross-engine (oracle-gated
    * as q53 with the same unrolled recurrence in SQL).
    *
    * Scale shape: one BSP round = one equi-join of the edge set against
    * the rank frame + one partial-aggregable groupBy on dst — the
    * join-aggregate iteration GraphX/Pregel runs, expressed declaratively.
    * The out-degree join is precomputed once. From the fourth round on,
    * every round localCheckpoints — the unrolled plan otherwise gains a
    * join+agg level per iteration and driver analysis time dominates,
    * exactly the lineage trap [[connectedComponents]] documents. The
    * result is always materialized before the internal caches are
    * released, so repeated calls do not accumulate pinned RDDs.
    *
    * @param edges two-column (src, dst) directed edge frame (pass both
    *   directions for an undirected graph); duplicate edges are collapsed
    * @param iters BSP rounds to run
    * @return (node, pr) with pr in 1e-6 units (a rank of 1.0 = 1000000) */
  def pageRankQ(edges: DataFrame, iters: Int): DataFrame = {
    val Array(srcCol, dstCol) = edges.columns
    val e = edges
      .select(col(srcCol).cast("string").as("src"),
        col(dstCol).cast("string").as("dst"))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val withDeg = e.join(
      e.groupBy(col("src")).agg(count(lit(1)).as("outdeg")), Seq("src"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nodes = e.select(col("src").as("node"))
      .unionByName(e.select(col("dst").as("node"))).distinct()
    var pr = nodes.withColumn("pr", lit(1000000L))
    for (i <- 1 to iters) {
      val contrib = withDeg
        .join(pr.select(col("node").as("src"), col("pr")), Seq("src"))
        .select(col("dst").as("node"), expr("pr div outdeg").as("c"))
        .groupBy(col("node")).agg(sum(col("c")).as("s"))
      pr = nodes.join(contrib, Seq("node"), "left")
        .select(col("node"),
          (lit(150000L) + expr("(85 * coalesce(s, 0L)) div 100")).as("pr"))
      // beyond a few rounds the unrolled plan grows a join+agg level per
      // iteration and driver analysis time dominates (the same trap
      // connectedComponents hit at 228 s) — cut lineage per round rather
      // than trust callers to read a comment. Below the threshold the
      // lazy plan is cheaper than a materialization barrier.
      if (i >= 4) pr = pr.localCheckpoint(true)
    }
    // materialize the result before releasing the caches it reads from,
    // so repeated calls never leak e/withDeg for the driver's lifetime
    val out = if (iters >= 4) pr else pr.localCheckpoint(true)
    e.unpersist()
    withDeg.unpersist()
    out
  }
}
