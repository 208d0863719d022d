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
    * directory. Output: (doc_id, fp, text, lang, source, n_tok). */
  def ingest(spark: SparkSession, dir: String,
             cfg: CorpusPipeline.Config = CorpusPipeline.Config()): DataFrame =
    spark.readStream
      .schema(docSchema)
      .parquet(dir)
      .withColumn("n_tok", size(split(col("text"), " ")).cast("long"))
      .withColumn("alpha_ratio",
        length(regexp_replace(col("text"), "[^a-z]", "")).cast("double") /
          length(col("text")).cast("double"))
      .filter(
        col("n_tok").between(cfg.minTokens, cfg.maxTokens) &&
          col("alpha_ratio") >= cfg.minAlphaRatio &&
          (if (cfg.asciiOnly) !col("text").rlike("[^\\x00-\\x7F]") else lit(true)))
      .withColumn("fp", md5(col("text")))
      .dropDuplicates("fp")
      .select(col("doc_id"), col("fp"), col("text"), col("lang"),
        col("source"), col("n_tok"))

  /** Append every newly admitted document into a source-partitioned corpus
    * directory. Admitted docs are emitted exactly once (append mode +
    * dedup state), so a plain append write is idempotent-per-document; the
    * checkpoint makes restarts resume, not re-admit. */
  def ingestToWarehouse(spark: SparkSession, dir: String, corpusPath: String,
                        checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    ingest(spark, dir).writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty)
          batch.write.mode("append").partitionBy("source").parquet(corpusPath)
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
