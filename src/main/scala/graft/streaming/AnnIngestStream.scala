package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** ANN-index maintenance AT INGEST — the streaming face of
  * [[graft.jobs.AnnIndex]], completing the index family's ingest story
  * (NearDupIndex ← NearDupStream, SemDeDupIndex ← SemDedupStream, this):
  * a continuously-growing corpus stays similarity-searchable without
  * nightly rebuilds, because each microbatch is assigned to the frozen
  * IVF centroids map-only and landed in its own cluster-partitioned
  * `ingest_batch` subtree.
  *
  * The module is deliberately thin: AnnIndex.append was DESIGNED for
  * foreachBatch — a replayed microbatch overwrites its own partition
  * (Structured Streaming re-delivers with the SAME batchId after a
  * crash, which is exactly the idempotency key), so the index never
  * holds a vector twice. Streaming batch ids start at 0 and the index's
  * build owns 0, so the stream maps batchId → batchId + 1 — a pure
  * deterministic shift that survives replay.
  *
  * Everything runs on the microbatch's own session clone (the `batch`
  * frame's session), never the outer session — the foreachBatch
  * session-clone trap DecontamStream documents.
  */
object AnnIngestStream {

  /** Continuous embedding ingest against an index built offline with
    * [[graft.jobs.AnnIndex.build]]: each microbatch lands in its own
    * `ingest_batch` partition and [[graft.jobs.AnnIndex.search]] sees it
    * on the next probe — the vectors table stays equal to a batch build +
    * appends of the same arrivals under any microbatch slicing. */
  def ingest(spark: SparkSession, dir: String, indexPath: String,
             checkpoint: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    spark.readStream.schema(SemDedupStream.vecSchema).parquet(dir)
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          graft.jobs.AnnIndex.append(batch.sparkSession, indexPath,
            batchId + 1L, batch.select(col("vec_id"), col("embedding")))
          ()
        }
      }
      .start()
}
