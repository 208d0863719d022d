package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, FloatType, LongType, StructType}

/** Semantic dedup AT INGEST — the streaming face of
  * [[graft.jobs.SemDeDupIndex]], completing the guardrail family
  * (NearDupStream flags lexical near-dups, DecontamStream rejects
  * benchmark leaks, this maintains the embedding-space removals table)
  * so a continuously-growing corpus keeps ALL THREE dedup modalities
  * current without nightly rebuilds.
  *
  * The module is deliberately thin: SemDeDupIndex.append was DESIGNED for
  * foreachBatch — its batch-partitioned layout makes a replayed
  * microbatch overwrite its own `ingest_batch` partitions (Structured
  * Streaming re-delivers with the SAME batchId after a crash, which is
  * exactly the idempotency key), and its `ingest_batch < b` stored side
  * makes the removals fold equal the from-scratch batch run under
  * whatever microbatch slicing the source produces
  * (SemDedupStreamSpec pins parity; SemDeDupIndexSpec pins the algebra).
  * Streaming batch ids start at 0 and the index's build owns 0, so the
  * stream maps batchId → batchId + 1 — a pure deterministic shift that
  * survives replay.
  *
  * Everything runs on the microbatch's own session clone (the `batch`
  * frame's session), never the outer session — the foreachBatch
  * session-clone trap DecontamStream documents.
  */
object SemDedupStream {

  /** (vec_id, embedding, label) — the embeddings table's arrival schema. */
  val vecSchema: StructType = new StructType()
    .add("vec_id", LongType)
    .add("embedding", ArrayType(FloatType))
    .add("label", org.apache.spark.sql.types.IntegerType)

  /** Continuous embedding ingest against an index built offline with
    * [[graft.jobs.SemDeDupIndex.build]]: each microbatch is assigned to
    * the frozen centroids, its removals delta lands in its own
    * `ingest_batch` partition, and the index's removals table stays equal
    * to a from-scratch batch run over everything ingested. */
  def ingestDeduped(spark: SparkSession, dir: String, indexPath: String,
                    checkpoint: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    spark.readStream.schema(vecSchema).parquet(dir)
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          graft.jobs.SemDeDupIndex.append(batch.sparkSession, indexPath,
            batchId + 1L, batch.select(col("vec_id"), col("embedding")))
          ()
        }
      }
      .start()
}
