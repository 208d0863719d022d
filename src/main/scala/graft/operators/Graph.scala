package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Distributed graph primitives needed by the training-data pipeline —
  * currently connected components, the canonical second stage of near-dup
  * deduplication (pair edges → duplicate clusters).
  */
object Graph {

  /** Connected components by iterative min-label propagation (BSP): every
    * node repeatedly takes the min of its own label and its neighbors',
    * converging to the component-minimum id in at most diameter rounds.
    *
    * Scale shape: each round is one equi-join + one groupBy over the EDGE
    * set only — nodes outside any edge never enter the computation, and
    * near-dup components are shallow near-cliques, so rounds stay small
    * (the driver loop is bounded and each round's frames are persisted,
    * unpersisted as soon as superseded). For adversarial long-chain graphs
    * the documented upgrade is the large-star/small-star variant, which
    * contracts chains in O(log n) rounds with the same per-round plan.
    *
    * @param edges two-column DataFrame of undirected edges
    * @return (id, component) — component = min node id reachable
    */
  def connectedComponents(edges: DataFrame): DataFrame = {
    val Array(srcCol, dstCol) = edges.columns
    val lvl = StorageLevel.MEMORY_AND_DISK
    val sym = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .unionByName(edges.select(col(dstCol).as("src"), col(srcCol).as("dst")))
      .persist(lvl)
    var labels = sym.select(col("src").as("id")).distinct()
      .withColumn("label", col("id"))
      .persist(lvl)
    var changed = 1L
    var rounds = 0
    while (changed > 0 && rounds < 64) {
      val prop = sym
        .join(labels.select(col("id").as("dst"), col("label").as("nl")), Seq("dst"))
        .groupBy(col("src")).agg(min(col("nl")).as("min_nbr"))
        .select(col("src").as("id"), col("min_nbr"))
      val next = labels.select(col("id"), col("label").as("old"))
        .join(prop, Seq("id"), "left")
        .select(col("id"), col("old"),
          least(col("old"), coalesce(col("min_nbr"), col("old"))).as("label"))
        .persist(lvl)
      changed = next.filter(col("label") =!= col("old")).count()
      labels.unpersist()
      labels = next.select(col("id"), col("label"))
      rounds += 1
    }
    sym.unpersist()
    labels.select(col("id"), col("label").as("component"))
  }
}
