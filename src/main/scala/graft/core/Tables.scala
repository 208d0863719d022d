package graft.core

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.{expr, timestamp_micros}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

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

  /** The `events` table with `ts` normalized to session-TZ TIMESTAMP,
    * dispatching on the type the scan actually produced rather than assuming
    * one parquet physical encoding. Generations of the testdata have shipped
    * `ts` as TIMESTAMP(NANOS) (read as raw Long nanos under the legacy
    * `nanosAsLong` conf) and as plain `timestamp[us]` (read as
    * TIMESTAMP_NTZ); hard-coding either breaks when the files are
    * regenerated, so this is the single place that decides. All sessions run
    * with `spark.sql.session.timeZone=UTC`, so the NTZ→TIMESTAMP cast maps
    * wall-clock to the identical instant DuckDB's `CAST(ts AS TIMESTAMP)`
    * produces. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val raw = apply(spark, dir, "events")
    raw.withColumn("ts", normalizeEventTs(raw, "ts"))
  }

  /** The dtype dispatch itself, reusable over any frame carrying an event
    * timestamp column (batch scan, streaming scan, test fixture):
    *  - TIMESTAMP: already what every query expects — identity.
    *  - TIMESTAMP_NTZ (parquet `timestamp[us]`, isAdjustedToUTC=false):
    *    cast to TIMESTAMP; exact under the UTC session timezone.
    *  - LONG (legacy TIMESTAMP(NANOS) files read with
    *    `spark.sql.legacy.parquet.nanosAsLong=true`): floor nanos to micros,
    *    the same truncation DuckDB applies casting TIMESTAMP_NS→TIMESTAMP.
    * Anything else fails loudly with the table/column/type named, so the
    * next data regeneration is a one-line diagnosis instead of nine silently
    * dropped gate rows. */
  def normalizeEventTs(df: DataFrame, colName: String): Column = {
    val c = org.apache.spark.sql.functions.col(colName)
    df.schema(colName).dataType match {
      case TimestampType    => c
      case TimestampNTZType => c.cast(TimestampType)
      case LongType         => timestamp_micros(expr(s"$colName div 1000"))
      case other => throw new IllegalStateException(
        s"events.$colName: expected TIMESTAMP, TIMESTAMP_NTZ, or LONG(nanos)," +
          s" scan produced $other — the testdata encoding changed; extend" +
          " Tables.normalizeEventTs for the new type")
    }
  }

  /** Register every table as a temp view so the whole surface is reachable
    * through `spark.sql(...)` — the SQL face of the engine (the reference's
    * users write SQL strings; here the same text runs through Catalyst with
    * pushdown instead of through a remote database). */
  def registerViews(spark: SparkSession, dir: String): Unit =
    all.foreach { n =>
      // events gets the ts normalization like every other consumer
      if (n == "events") events(spark, dir).createOrReplaceTempView(n)
      else apply(spark, dir, n).createOrReplaceTempView(n)
    }
}
