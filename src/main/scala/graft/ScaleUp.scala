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

    // The id offset MUST be injective under COMPOSITION: sf10 is built by
    // applying ScaleUp to sf1's output, and a FIXED additive offset
    // (id + r·10⁹) collapses replica pairs with equal r₁+r₂ onto one id —
    // at sf10 that produced duplicate doc_ids, which broke every
    // unique-id-contract operator downstream (found when t32's jaccard
    // denominator hit zero: a collided id carries two texts, so its gram
    // join multiplies and `inter` overshoots the set sizes). Fix: the
    // offset is a POWER OF TEN STRICTLY ABOVE the input's max id (never
    // below the historical 10⁹, so a first application reproduces the old
    // layout bit-for-bit) — replica id ranges then never overlap however
    // many times ScaleUp chains. A power of ten also preserves
    // id % 10 == base % 10, which gate fixtures use as a base-level split.
    // Columns joined across tables (o_orderkey/l_orderkey) must share ONE
    // offset, computed from the key's owning table.
    val OFF = 1000000000L
    def reps(df: DataFrame): DataFrame =
      df.crossJoin(spark.range(factor).select(col("id").as("__r")))
    /** smallest power of 10 > max(df[c]), floored at the legacy 10⁹ */
    def offsetFor(df: DataFrame, c: String): Long = {
      val mx = df.agg(org.apache.spark.sql.functions.max(col(c)))
        .head().getLong(0)
      math.max(OFF, math.pow(10.0, mx.toString.length.toDouble).toLong)
    }
    def off(c: String, offset: Long): org.apache.spark.sql.Column =
      col(c) + col("__r") * offset

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
    val orders = graft.core.Tables(spark, in, "orders")
    val orderOff = offsetFor(orders, "o_orderkey")
    write("orders", reps(orders)
      .withColumn("o_orderkey", off("o_orderkey", orderOff)).drop("__r"))
    write("lineitem", reps(graft.core.Tables(spark, in, "lineitem"))
      .withColumn("l_orderkey", off("l_orderkey", orderOff)).drop("__r"))
    // events: new event ids AND new users per replica (user cardinality
    // scales with volume; per-user history length stays constant)
    val events = graft.core.Tables(spark, in, "events")
    val evOff = offsetFor(events, "event_id")
    val userOff = offsetFor(events, "user_id")
    write("events", reps(events)
      .withColumn("event_id", off("event_id", evOff))
      .withColumn("user_id", off("user_id", userOff)).drop("__r"))
    // documents: near-dup replicas (suffix token changes a few shingles).
    // Replica 0 stays byte-identical to the base corpus — embeddings' jitter
    // is already zero at __r = 0, and keeping both sides unperturbed keeps
    // the text-side and vector-side near-dup structure consistent per doc
    val docs = graft.core.Tables(spark, in, "documents")
    val docOff = offsetFor(docs, "doc_id")
    write("documents", reps(docs)
      .withColumn("doc_id", off("doc_id", docOff))
      .withColumn("text", when(col("__r") === 0, col("text"))
        .otherwise(concat(col("text"), lit(" r"), col("__r").cast("string"))))
      .withColumn("n_chars", length(col("text")).cast("long")).drop("__r"))
    // embeddings: deterministic per-replica jitter in the 4th decimal —
    // inside near-dup range, outside exact-dup range
    val embs = graft.core.Tables(spark, in, "embeddings")
    val vecOff = offsetFor(embs, "vec_id")
    write("embeddings", reps(embs)
      .withColumn("embedding", expr(
        "transform(embedding, (v, i) -> v + cast(__r as float) * 1e-4f * " +
          "cast(1 + pmod(i, 3) as float))"))
      .withColumn("vec_id", off("vec_id", vecOff)).drop("__r"))
    spark.stop()
  }
}
