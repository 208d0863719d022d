package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sliding-window document chunking — the context-window segmentation a
  * pretraining / retrieval corpus needs (window of W tokens advancing by a
  * stride S < W gives overlapping chunks; S = W gives the partition
  * [[NearDup.chunkDedup]] deduplicates).
  *
  * Scale shape: pure columnar — split → transform(sequence) → posexplode →
  * slice; no UDF, no shuffle, no state. Each input row expands to
  * ceil(n_tok / S) rows inside the scan stage, so the operator pipelines
  * into whatever consumes it (dedup, embedding, packing) without a
  * materialization barrier. Provenance is kept as (doc, chunk_id,
  * start_tok), which is all a trainer needs to reconstruct or attribute.
  * Oracle-gated cross-engine as t27_chunk_sliding.
  */
object Chunk {

  /** One row per (doc, window start): start_tok counts from 0 in stride
    * steps; the final chunks are shorter than `window` when the tail runs
    * out (n_tok carries the actual length). */
  def sliding(docs: DataFrame, window: Int, stride: Int,
              idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(window > 0 && stride > 0, "window and stride must be positive")
    docs.select(col(idCol), split(col(textCol), " ").as("__ws"))
      .select(col(idCol), posexplode(expr(
        s"""transform(sequence(0, size(__ws) - 1, $stride),
            st -> struct(st AS start_tok,
              array_join(slice(__ws, st + 1, $window), ' ') AS chunk_text,
              least($window, size(__ws) - st) AS n_tok))""")))
      .select(col(idCol),
        col("pos").cast("long").as("chunk_id"),
        col("col.start_tok").cast("long").as("start_tok"),
        col("col.n_tok").cast("long").as("n_tok"),
        col("col.chunk_text").as("chunk_text"))
  }
}
