package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.jobs.CorpusPipeline

/** Continuous training-data ingest: the batch corpus pipeline's front half
  * (quality clean → exact dedup) as a Structured Streaming query, so a
  * corpus GROWS continuously instead of being rebuilt by cron — the
  * documents-table analogue of EventStream's rollupToWarehouse.
  *
  * Scale notes:
  *  - the clean gates are stateless columnar expressions — they add no
  *    streaming state at all;
  *  - cross-batch exact dedup is `dropDuplicates` on the md5 fingerprint:
  *    state is one small row per DISTINCT document ever admitted, which is
  *    the correct semantic for corpus identity (a duplicate must be dropped
  *    no matter how far apart the two copies arrive). When near-window
  *    dedup is enough, `dropDuplicatesWithinWatermark` on an ingest-time
  *    column bounds that state by the watermark instead — the trade is
  *    documented, not hidden;
  *  - `dropDuplicates` keeps the first ARRIVED copy (arrival order), where
  *    the batch pipeline keeps min doc_id — identical fingerprint sets,
  *    possibly different surviving ids; CorpusStreamSpec pins both facts.
  */
object CorpusStream {

  /** Parquet schema of the documents table (TESTDATA.md). */
  val docSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** Clean + fingerprint + cross-batch exact dedup over a growing document
    * directory. The clean gate IS the batch pipeline's
    * (CorpusPipeline.clean — one definition, so the streaming admit set
    * cannot silently diverge). Output: (doc_id, fp, text, lang, source,
    * n_tok). */
  def ingest(spark: SparkSession, dir: String,
             cfg: CorpusPipeline.Config = CorpusPipeline.Config()): DataFrame =
    CorpusPipeline.clean(
        spark.readStream.schema(docSchema).parquet(dir), cfg)
      .withColumn("fp", md5(col("text")))
      .dropDuplicates("fp")
      .select(col("doc_id"), col("fp"), col("text"), col("lang"),
        col("source"), col("n_tok"))

  /** Write every newly admitted document into a batch-partitioned corpus
    * directory. foreachBatch is at-least-once (a crash between the write
    * and the checkpoint commit replays the batch), so the write is keyed
    * by batch_id with dynamic partition OVERWRITE — a replayed batch
    * rewrites its own partition instead of appending duplicates. */
  def ingestToWarehouse(spark: SparkSession, dir: String, corpusPath: String,
                        checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    ingest(spark, dir).writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty)
          graft.core.Sink.overwritePartitions(
            batch.withColumn("batch_id", lit(batchId)),
            corpusPath, Seq("batch_id", "source"))
      }
      .start()

  /** Test/local harness: drive the ingest over whatever files exist and
    * leave the admitted docs in an in-memory table. */
  def runOnce(spark: SparkSession, dir: String, tableName: String): DataFrame = {
    val q = ingest(spark, dir).writeStream
      .outputMode("append")
      .format("memory")
      .queryName(tableName)
      .start()
    q.processAllAvailable()
    q.stop()
    spark.table(tableName)
  }
}
