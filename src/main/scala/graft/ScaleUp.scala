package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev utility: derive a larger scale factor from an existing testdata dir
  * by replicating the FACT tables `factor`× with key offsets (dimensions
  * stay fixed — the realistic shape: facts grow, dims don't), so scaling
  * behavior can be measured beyond the driver-provided SFs with the same
  * bench harness (`SPARK_GRAFT_SF_DIR=<out> graft.Bench`).
  *
  * Replication is deterministic and key-disjoint: replica i offsets every
  * surrogate key by i·10^9. Document text gets a per-replica suffix token
  * and embeddings a per-replica deterministic jitter, so replicas are
  * NEAR-duplicates, not exact ones — deliberately stressing the near-dup /
  * LSH / clustering operators with 10× docs and ~10× denser dup structure
  * (the adversarial direction for dedup at scale).
  *
  * Usage: ScaleUp [inDir] [outDir] [factor]
  */
object ScaleUp {
  def main(args: Array[String]): Unit = {
    val in = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val out = if (args.length > 1) args(1) else "/tmp/sf1"
    val factor = if (args.length > 2) args(2).toInt else 10
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      // keep the NANOS→Long branch of Tables.normalizeEventTs reachable
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val OFF = 1000000000L
    def reps(df: DataFrame): DataFrame =
      df.crossJoin(spark.range(factor).select(col("id").as("__r")))
    def off(c: String): org.apache.spark.sql.Column =
      col(c) + col("__r") * OFF

    def write(name: String, df: DataFrame): Unit = {
      df.write.mode("overwrite").parquet(s"$out/$name.parquet")
      println(s"[scaleup] wrote $name")
    }

    // dimensions: copy unchanged
    Seq("region", "nation", "customer", "supplier", "part").foreach { t =>
      write(t, graft.core.Tables(spark, in, t))
    }
    // orders/lineitem: replicate on the order-key spine; customers/parts/
    // suppliers are shared across replicas (fact-to-dim fan-in grows, the
    // realistic direction)
    write("orders", reps(graft.core.Tables(spark, in, "orders"))
      .withColumn("o_orderkey", off("o_orderkey")).drop("__r"))
    write("lineitem", reps(graft.core.Tables(spark, in, "lineitem"))
      .withColumn("l_orderkey", off("l_orderkey")).drop("__r"))
    // events: new event ids AND new users per replica (user cardinality
    // scales with volume; per-user history length stays constant)
    write("events", reps(graft.core.Tables(spark, in, "events"))
      .withColumn("event_id", off("event_id"))
      .withColumn("user_id", off("user_id")).drop("__r"))
    // documents: near-dup replicas (suffix token changes a few shingles).
    // Replica 0 stays byte-identical to the base corpus — embeddings' jitter
    // is already zero at __r = 0, and keeping both sides unperturbed keeps
    // the text-side and vector-side near-dup structure consistent per doc
    write("documents", reps(graft.core.Tables(spark, in, "documents"))
      .withColumn("doc_id", off("doc_id"))
      .withColumn("text", when(col("__r") === 0, col("text"))
        .otherwise(concat(col("text"), lit(" r"), col("__r").cast("string"))))
      .withColumn("n_chars", length(col("text")).cast("long")).drop("__r"))
    // embeddings: deterministic per-replica jitter in the 4th decimal —
    // inside near-dup range, outside exact-dup range
    write("embeddings", reps(graft.core.Tables(spark, in, "embeddings"))
      .withColumn("embedding", expr(
        "transform(embedding, (v, i) -> v + cast(__r as float) * 1e-4f * " +
          "cast(1 + pmod(i, 3) as float))"))
      .withColumn("vec_id", off("vec_id")).drop("__r"))
    spark.stop()
  }
}
