package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Video frame-level near-dup flagging AT INGEST — the streaming face of
  * [[graft.jobs.FrameIndex]], completing the index family's ingest story
  * (NearDupIndex ← NearDupStream, SemDeDupIndex ← SemDedupStream,
  * AnnIndex ← AnnIngestStream, this): each arriving batch of videos is
  * flagged against the whole stored corpus the moment it lands, under the
  * build-frozen frame dictionary, and absorbed into the index's
  * `ingest_batch` layout.
  *
  * Thin by design, like AnnIngestStream: FrameIndex.append was built for
  * foreachBatch — a replayed microbatch (same batchId after a crash)
  * overwrites its OWN framesets partition and its OWN pairs partition, so
  * neither the index nor the flag log ever holds an arrival twice.
  * Streaming batch ids start at 0 and build owns ingest batch 0, so the
  * stream maps batchId → batchId + 1 (a pure shift that survives replay).
  * Everything runs on the microbatch's own session clone (the
  * foreachBatch session-clone trap DecontamStream documents).
  */
object FrameIngestStream {

  /** Continuous media ingest against an index built offline with
    * [[graft.jobs.FrameIndex.build]]: each microbatch's near-dup pairs
    * land under `pairsOut/ingest_batch=<b>` (the flag log — union the
    * partitions for the accumulated pair set) and its frame sets join the
    * index, leaving on-disk state equal to a batch build + appends of the
    * same arrivals under any microbatch slicing. */
  def ingest(spark: SparkSession, dir: String, indexPath: String,
             pairsOut: String, checkpoint: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    spark.readStream.schema(CorpusStream.docSchema).parquet(dir)
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          val media = batch.select(col("doc_id").as("media_id"),
            coalesce(col("text"), lit("")).cast("binary").as("payload"))
          graft.jobs.FrameIndex
            .append(batch.sparkSession, indexPath, batchId + 1L, media)
            .write.mode("overwrite")
            .parquet(s"$pairsOut/ingest_batch=${batchId + 1L}")
        }
      }
      .start()
}
