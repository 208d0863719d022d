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
}
