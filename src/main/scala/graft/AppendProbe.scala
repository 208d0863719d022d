package graft

import org.apache.spark.sql.functions._

/** Measures [[graft.jobs.SemDeDupIndex.append]]'s per-batch latency at a
  * realistic stored size — the evidence half of the ADVICE-r11 broadcast
  * restoration (the plan half is pinned in SemDeDupIndexSpec: with
  * `hintShuffle = false` the incremental pair joins broadcast a small
  * fresh batch instead of shuffling the full stored members side every
  * microbatch).
  *
  * Protocol: build the index over all but the tail of a scale surface's
  * embeddings, then append the tail in `batches` equal microbatches,
  * timing each append wall-clock (write + incremental pair join + delta
  * write + removals fold). The per-batch number is the steady-state
  * ingest latency a streaming deployment pays.
  *
  * Usage: AppendProbe [sfDir] [k] [batches] [batchSize]
  *   (defaults: /tmp/sf10, 8, 3, 1000)
  */
object AppendProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/tmp/sf10"
    val k = if (args.length > 1) args(1).toInt else 8
    val batches = if (args.length > 2) args(2).toInt else 3
    val batchSize = if (args.length > 3) args(3).toLong else 1000L
    val spark = Bench.buildSession(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    graft.functions.VectorExpressions.register(spark)
    val vecs = graft.queries.Q.T(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding")).localCheckpoint()
    val n = vecs.count()
    val cut = n - batches * batchSize
    val dir = java.nio.file.Files.createTempDirectory("semdedup_append").toString
    val t0 = System.nanoTime()
    graft.jobs.SemDeDupIndex.build(
      vecs.filter(col("vec_id") < cut), dir, k)
    println(f"build: ${cut} stored vectors, k=$k, " +
      f"${(System.nanoTime() - t0) / 1e9}%.2f s")
    for (b <- 1 to batches) {
      val lo = cut + (b - 1) * batchSize
      val hi = lo + batchSize
      val t1 = System.nanoTime()
      graft.jobs.SemDeDupIndex.append(spark, dir, b.toLong,
        vecs.filter(col("vec_id") >= lo && col("vec_id") < hi)).count()
      println(f"append batch $b ($batchSize rows vs ${lo} stored): " +
        f"${(System.nanoTime() - t1) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
