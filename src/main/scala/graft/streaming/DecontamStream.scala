package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Fuzzy DECONTAMINATION AT INGEST — the streaming guardrail form of the
  * batch t32 pass ([[graft.operators.NearDup.crossMinHashPairs]]): every
  * arriving document is checked against the held-out eval suite the moment
  * it lands, flagged leaks go to a quarantine path with their evidence
  * (best-matching eval doc + Jaccard), and only clean documents are
  * admitted to the corpus. A benchmark leak that reaches the training mix
  * is expensive to claw back (the corpus shards it touched must be
  * rebuilt); rejecting at the door is the production shape.
  *
  * Contract (pinned in DecontamStreamSpec): decontamination is
  * per-train-doc independent — a document's shingle signature, its LSH
  * candidates, and its verification against the STATIC eval side do not
  * depend on any other train document — so the union of per-microbatch
  * flagged sets equals the batch operator's output on the full corpus
  * EXACTLY, under any arrival slicing. (Contrast NearDupStream, whose
  * train×train pairs need cross-batch state; train×eval needs none.)
  *
  * Scale notes: work per microbatch is batch-proportional (one signature
  * groupBy + one candidate-bounded verify); every eval-side operand is
  * broadcast (an eval suite is small by construction); the foreachBatch
  * writes are keyed by batch_id with dynamic partition overwrite, so an
  * at-least-once replay rewrites its own partition instead of duplicating
  * (same idempotency contract as CorpusStream.ingestToWarehouse).
  */
object DecontamStream {

  /** Per-batch flagged-doc summary: worst leak evidence per train doc —
    * max_jaccard and its ARGMAX eval doc as one struct-max (ties to the
    * higher eval_id), so the evidence row always attributes the score to
    * the benchmark document that produced it. */
  private[streaming] def flagSummary(batch: DataFrame,
                                     evalDocs: DataFrame): DataFrame =
    graft.operators.NearDup.crossMinHashPairs(
        batch.select(col("doc_id"), col("text")), evalDocs)
      .groupBy(col("train_id").as("doc_id"))
      .agg(max(struct(col("jaccard"), col("eval_id"))).as("best"),
        count(lit(1)).as("n_eval_hits"))
      .select(col("doc_id"), col("best.jaccard").as("max_jaccard"),
        col("best.eval_id").as("best_eval_id"), col("n_eval_hits"))

  /** Continuous ingest with decontamination: admitted docs append to
    * `corpusPath`, flagged docs (with evidence columns) to
    * `quarantinePath`, both batch_id-partitioned for replay idempotency.
    * `evalDocs` is the static held-out suite as a batch (id, text) frame. */
  def ingestDecontaminated(spark: SparkSession, dir: String,
                           evalDocs: DataFrame,
                           corpusPath: String, quarantinePath: String,
                           checkpoint: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    spark.readStream.schema(CorpusStream.docSchema).parquet(dir)
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          // the flag summary feeds BOTH writes — persist it so the batch's
          // signature pass runs once, and release before the next batch
          val flagged = flagSummary(batch, evalDocs)
            .persist(StorageLevel.MEMORY_AND_DISK)
          try {
            graft.core.Sink.overwritePartitions(
              batch.join(flagged.select(col("doc_id")), Seq("doc_id"),
                  "left_anti")
                .withColumn("batch_id", lit(batchId)),
              corpusPath, Seq("batch_id"))
            graft.core.Sink.overwritePartitions(
              batch.join(flagged, Seq("doc_id"))
                .withColumn("batch_id", lit(batchId)),
              quarantinePath, Seq("batch_id"))
          } finally flagged.unpersist(false)
        }
        ()
      }
      .start()

}
