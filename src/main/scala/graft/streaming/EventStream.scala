package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Structured Streaming surface for the `events` table shape.
  *
  * The reference has no streaming (SURVEY.md §2.9) — its analogue is the
  * cron-driven incremental batch refresh. This module provides the real
  * streaming path for the same rollups the batch queries compute
  * (EventQueries e02): file-source `readStream` → watermark → tumbling
  * window → aggregate, so a deployment can switch the hourly rollup from
  * batch to continuous without changing downstream schemas.
  *
  * Scale notes: the aggregation state is keyed by (window, event_type) —
  * bounded cardinality; the 2-hour watermark bounds state retention; file
  * sources at 100 TB would be replaced by a Kafka source with identical
  * downstream plan.
  */
object EventStream {

  /** Parquet schema of the events table, with `ts` as the CURRENT testdata
    * encoding (`timestamp[us]` → TIMESTAMP_NTZ). [[readEvents]] overrides the
    * ts field with whatever type the staged files actually carry, so a
    * regeneration that flips the encoding again re-dispatches instead of
    * failing analysis. */
  val rawSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampNTZType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** File-source stream over staged event parquet with `ts` normalized to
    * TIMESTAMP. `readStream` requires a user schema, so peek at the actual
    * ts dtype with a batch footer read (one driver-side listing — nothing is
    * scanned), then reuse the central batch/stream-agnostic dispatch
    * ([[graft.core.Tables.normalizeEventTs]]). */
  def readEvents(spark: SparkSession, dir: String): DataFrame = {
    // an EMPTY (or not-yet-created) staging dir can't be peeked but is a
    // legitimate stream start state — fall back to the current known
    // encoding; the dispatch self-corrects on the next session once files
    // exist. ONLY that case falls back: a corrupt footer, permission
    // failure, or wrong path must surface as itself, not as a silently
    // guessed schema that fails much later
    val actualTs =
      try spark.read.parquet(dir).schema("ts").dataType
      catch {
        case e: org.apache.spark.sql.AnalysisException
            if e.getCondition == "UNABLE_TO_INFER_SCHEMA" ||
              e.getCondition == "PATH_NOT_FOUND" =>
          rawSchema("ts").dataType
      }
    val schema = StructType(rawSchema.map(f =>
      if (f.name == "ts") f.copy(dataType = actualTs) else f))
    val stream = spark.readStream.schema(schema).parquet(dir)
    stream.withColumn("ts", graft.core.Tables.normalizeEventTs(stream, "ts"))
  }

  /** Streaming hourly rollup: same output schema as the batch
    * e02_hourly_rollup (window start = the date_trunc'd hour). */
  def hourlyRollup(spark: SparkSession, dir: String): DataFrame = {
    readEvents(spark, dir)
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        (sum(graft.functions.Money.cents(col("value"))) / 100.0).as("total_value"))
      .select(col("window.start").as("hour"), col("event_type"), col("n"),
        col("total_value"))
  }

  /** Streaming dedup-keep-first: same semantics as the batch e03 query
    * (first event per (user_id, event_type) by event time, event_id as the
    * tiebreak) as a continuous aggregation — min(struct(ts, event_id))
    * per key, which is ARRIVAL-ORDER-FREE, unlike `dropDuplicates`, whose
    * "first" is whichever row the source happened to deliver first.
    *
    * State is one small row per live (user_id, event_type) key. For
    * unbounded key spaces the production variant is
    * `dropDuplicatesWithinWatermark` (state expires with the watermark) at
    * the cost of the arrival-order caveat above. */
  def dedupFirst(spark: SparkSession, dir: String): DataFrame = {
    readEvents(spark, dir)
      .groupBy(col("user_id"), col("event_type"))
      .agg(min(struct(col("ts"), col("event_id"))).as("first"))
      .select(col("user_id"), col("event_type"),
        col("first.event_id").as("event_id"), col("first.ts").as("ts"))
  }

  /** Stream-stream watermarked interval join (click attribution): each
    * purchase joins every click by the same user in the preceding 30
    * minutes. This is the remaining stateful-streaming shape after
    * aggregation (hourlyRollup), dedup (dedupFirst), and sessionization
    * (SessionStream): a two-sided join whose buffered state Spark bounds
    * from the watermark + the time-range predicate — clicks older than
    * (watermark − 30 min) are evicted, so state is O(rate × window), not
    * O(history). The batch equivalent (same predicate over the static
    * table) is proven equal in EventStreamSpec. */
  def clickAttribution(spark: SparkSession, dir: String): DataFrame =
    attribution(spark, dir, "inner")

  /** LEFT OUTER variant: a purchase with NO click in its 30-minute window
    * still emits — with a null click — once the watermark proves no
    * matching click can still arrive (watermark past the purchase's join
    * window). This is the streaming form of "every purchase gets an
    * attribution row, attributed or organic"; in batch the outer row is
    * free (e09_attribution_outer), in streaming it is exactly the
    * state-eviction point made visible. */
  def clickAttributionOuter(spark: SparkSession, dir: String): DataFrame =
    attribution(spark, dir, "left_outer")

  private def attribution(spark: SparkSession, dir: String,
                          joinType: String): DataFrame = {
    def side(eventType: String, prefix: String): DataFrame =
      readEvents(spark, dir)
        .filter(col("event_type") === eventType)
        .select(col("event_id").as(s"${prefix}_id"),
          col("user_id").as(s"${prefix}_user"), col("ts").as(s"${prefix}_ts"))
        .withWatermark(s"${prefix}_ts", "1 hour")
    side("purchase", "p").join(side("click", "c"),
      col("p_user") === col("c_user") &&
        col("c_ts") <= col("p_ts") &&
        col("c_ts") >= col("p_ts") - expr("INTERVAL 30 MINUTES"),
      joinType)
      .select(col("p_id"), col("c_id"), col("p_user").as("user_id"),
        col("p_ts"), col("c_ts"))
  }

  /** Continuous refresh INTO the medallion warehouse: each micro-batch of
    * the hourly rollup overwrites exactly the hour partitions it touches
    * via `Sink.overwritePartitions` (foreachBatch is the canonical bridge
    * from a streaming query to a batch writer). Update mode re-emits a
    * window whenever late-but-in-watermark data changes it, and the dynamic
    * partition overwrite makes the re-emission idempotent — the warehouse
    * converges to the batch answer without read-modify-write of untouched
    * hours. Downstream readers see the same partition-pruned layout the
    * batch jobs write. */
  def rollupToWarehouse(spark: SparkSession, dir: String,
                        warehousePath: String): org.apache.spark.sql.streaming.StreamingQuery =
    hourlyRollup(spark, dir).writeStream
      .outputMode("update")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // partition by the FULL group key: update mode re-emits only the
        // changed (hour, event_type) rows, so the overwrite unit must be
        // that exact granularity or unchanged types of the hour would drop
        if (!batch.isEmpty)
          graft.core.Sink.overwritePartitions(
            batch.withColumn("hour_key", date_format(col("hour"), "yyyy-MM-dd-HH")),
            warehousePath, Seq("hour_key", "event_type"))
      }
      .start()

  /** Drive the streaming query over whatever files exist, synchronously, and
    * leave the result in an in-memory table (test/local harness). */
  def runOnce(spark: SparkSession, dir: String, tableName: String): DataFrame =
    runQuery(hourlyRollup(spark, dir), tableName)

  /** Same harness for the dedup stream. */
  def runDedupOnce(spark: SparkSession, dir: String, tableName: String): DataFrame =
    runQuery(dedupFirst(spark, dir), tableName)

  /** Same harness for the join stream (append mode — stream-stream inner
    * joins emit rows exactly once, so append is the natural mode). */
  def runAttributionOnce(spark: SparkSession, dir: String,
                         tableName: String): DataFrame =
    runQuery(clickAttribution(spark, dir), tableName, mode = "append")

  private def runQuery(df: DataFrame, tableName: String,
                       mode: String = "complete"): DataFrame = {
    val spark = df.sparkSession
    val q = df.writeStream
      .outputMode(mode)
      .format("memory")
      .queryName(tableName)
      .start()
    q.processAllAvailable()
    q.stop()
    spark.table(tableName)
  }
}
