package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet-backed table loader over a scale-factor directory.
  *
  * Plays the role of the reference's single-Postgres three-layer catalog
  * (reference: models/engine.py:10-23 builds one SQLAlchemy engine that every
  * job reads through). Here each table is a path-addressed parquet dataset so
  * Catalyst gets native filter/column pushdown and partition pruning instead of
  * hand-written SQL strings.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Register every table as a temp view so the whole surface is reachable
    * through `spark.sql(...)` — the SQL face of the engine (the reference's
    * users write SQL strings; here the same text runs through Catalyst with
    * pushdown instead of through a remote database). */
  def registerViews(spark: SparkSession, dir: String): Unit =
    all.foreach { n =>
      // events needs the nanos-as-long read path like everywhere else
      if (n == "events") {
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        apply(spark, dir, n)
          .withColumn("ts", org.apache.spark.sql.functions
            .timestamp_micros(org.apache.spark.sql.functions.expr("ts div 1000")))
          .createOrReplaceTempView(n)
      } else apply(spark, dir, n).createOrReplaceTempView(n)
    }
}
