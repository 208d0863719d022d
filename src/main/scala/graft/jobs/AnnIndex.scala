package graft.jobs

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.KMeans

/** IVF index as a DISK LAYOUT: k-means training (operators/KMeans) plus a
  * cluster-partitioned parquet directory, so an ANN probe is partition
  * pruning — the query reads exactly `nProbe` directories and never
  * touches the rest of the corpus. This is the piece that turns s02/s05's
  * "probe one cluster" plan shape into physical I/O savings at 100 TB:
  * listing-time pruning on `cluster=` directories, the same mechanism the
  * warehouse uses for `period_start` refresh (ScaleSpec proves the pruning
  * metric).
  *
  * Layout: `<path>/vectors/cluster=<c>/…` (id, embedding per row) and
  * `<path>/centroids` (cluster, i, cv — exact quantized integers).
  */
object AnnIndex {

  /** Train and write the index; returns the per-cluster row counts. */
  def build(embeddings: DataFrame, idCol: String, vecCol: String,
            k: Int, iters: Int, path: String): DataFrame = {
    val (assign, cents) = KMeans.lloyd(embeddings, idCol, vecCol, k, iters)
    embeddings
      .join(assign.select(col("id").as(idCol), col("cluster")), idCol)
      // co-locate each cluster in one task so each cluster= directory holds
      // one file — the probe's I/O is then exactly nProbe files
      .repartition(k, col("cluster"))
      .write.partitionBy("cluster").mode("overwrite")
      .parquet(s"$path/vectors")
    cents.write.mode("overwrite").parquet(s"$path/centroids")
    embeddings.sparkSession.read.parquet(s"$path/vectors")
      .groupBy(col("cluster")).agg(count(lit(1)).as("n_vectors"))
  }

  /** Incremental maintenance: assign NEW vectors to the existing centroids
    * (KMeans.assignTo — map-only, no retraining) and append them into the
    * cluster-partitioned layout. Probes keep pruning to the same
    * directories; each append adds one file per touched cluster, so probe
    * I/O grows by one file per increment — rebuild (compact) when the
    * increment count matters, exactly like any LSM-ish layout. Returns the
    * refreshed per-cluster counts. */
  def append(newVectors: DataFrame, idCol: String, vecCol: String,
             path: String): DataFrame = {
    val spark = newVectors.sparkSession
    val cents = spark.read.parquet(s"$path/centroids")
    val k = cents.agg(countDistinct(col("cluster"))).head().getLong(0).toInt
    val assign = KMeans.assignTo(newVectors, idCol, vecCol, cents)
    newVectors
      .join(assign.select(col("id").as(idCol), col("cluster")), idCol)
      .repartition(k, col("cluster"))
      .write.partitionBy("cluster").mode("append")
      .parquet(s"$path/vectors")
    // counts of the INCREMENT only — rescanning the whole layout for a
    // return value would cost O(full index) read I/O per append
    assign.groupBy(col("cluster")).agg(count(lit(1)).as("n_appended"))
  }

  /** Exact integer squared distance of a quantized query to each stored
    * centroid, on the driver — k·dim longs, the same scalar math the
    * trainer uses. */
  private[graft] def probeClusters(spark: SparkSession, path: String,
                                   q: Array[Long], nProbe: Int): Seq[Long] = {
    val cents = KMeans.parseCentroids(spark.read.parquet(s"$path/centroids").collect())
    cents.map { case (c, cv) =>
      (cv.zip(q).map { case (a, b) => (a - b) * (a - b) }.sum, c)
    }.sorted.take(nProbe).map(_._2)
  }

  /** Top-k cosine neighbors of `query`, reading ONLY the probed cluster
    * partitions. Scores use the engine's exact quantized integers. */
  def search(spark: SparkSession, path: String, query: Array[Float],
             k: Int, nProbe: Int): DataFrame = {
    graft.functions.VectorExpressions.register(spark)
    val qQuant = query.map(x => math.floor(x * 1000.0 + 0.5).toLong)
    val probes = probeClusters(spark, path, qQuant, nProbe)
    val qLit = array(query.toIndexedSeq.map(lit(_)): _*).cast("array<float>")
    val cand = spark.read.parquet(s"$path/vectors")
      .filter(col("cluster").isin(probes.toIndexedSeq: _*))
    cand
      .withColumn("dot",
        graft.functions.VectorExpressions.quantizedDot(col("embedding"), qLit))
      .withColumn("n2",
        graft.functions.VectorExpressions.quantizedNorm2(col("embedding")))
      .withColumn("cos_sim", col("dot").cast("double") /
        (sqrt(col("n2").cast("double")) *
          math.sqrt(qQuant.map(x => x * x).sum.toDouble)))
      .orderBy(col("cos_sim").desc, col("vec_id"))
      .limit(k)
      .select(col("vec_id"), col("cluster"), col("cos_sim"))
  }
}
