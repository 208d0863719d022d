package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Video frame-level near-duplication primitives — ONE definition shared
  * by the hash-gated batch query (v06_video_neardup in
  * queries/MultimodalQueries) and the disk-backed incremental index
  * ([[graft.jobs.FrameIndex]]), so the ingest path can never silently
  * diverge from the gated semantics (the LangModel/SemDedup pattern).
  *
  * Semantics (the v06 contract): each video's payload is sliced into
  * fixed-length frames and every stride-th frame is fingerprinted (v02's
  * slicing geometry — md5 over the frame's canonical upper-hex form, which
  * both engines construct byte-identically); candidates are pairs sharing
  * at least one DICTIONARY frame (exact shared-frame buckets — the LSH
  * band pattern with the fingerprint as the band; a fingerprint whose
  * document frequency exceeds the cap is boilerplate and generates no
  * candidates, bounding bucket fan-out so the join is never video×video);
  * a candidate pair near-dups iff the Jaccard overlap of the two videos'
  * FULL distinct-frame sets passes the threshold. The filter compares in
  * exact integer arithmetic (shared·jDen ≥ jNum·(n_a+n_b−shared)); the
  * reported jaccard is the single IEEE division over the same exact
  * integers (hash-stable cross-engine — the cosine trick).
  */
object FrameDedup {

  /** Sampled-frame fingerprints `(media_id, frame_fp)`, DISTINCT per
    * media, from `(media_id, payload: binary)` rows. Empty payloads
    * produce no frames. One projection + bounded explode per row —
    * payload bytes are read once and never shuffle (features do). */
  def frameFingerprints(media: DataFrame, frameLen: Int = 32,
                        stride: Int = 4): DataFrame =
    media
      .withColumn("n", length(col("payload")).cast("long"))
      .filter(col("n") > 0)
      .select(col("media_id"), col("payload"), col("n"),
        explode(expr(
          s"sequence(0, (n + ${frameLen - 1}) div $frameLen - 1, $stride)"))
          .as("frame_idx"))
      .select(col("media_id"),
        md5(upper(hex(expr(
          s"substring(payload, CAST(frame_idx*$frameLen + 1 AS INT), $frameLen)"))))
          .as("frame_fp"))
      .distinct()

  /** Per-media sorted fingerprint set `(media_id, fps, n)` — the row the
    * disk index stores (one row per video, the compaction key). */
  def frameSets(frames: DataFrame): DataFrame =
    frames.groupBy(col("media_id"))
      .agg(sort_array(collect_set(col("frame_fp"))).as("fps"))
      .withColumn("n", size(col("fps")).cast("long"))

  /** Candidate dictionary: fingerprints with document frequency in
    * [minDf, maxDf]. The batch gate passes minDf = 2 (a df-1 frame cannot
    * pair — pure pruning); the FROZEN index dictionary passes minDf = 1,
    * because a build-time singleton must stay pairable when its twin
    * arrives in a later batch (only the UPPER cap freezes — a frame above
    * it at build stays boilerplate forever, the same conservative drift
    * contract as AnnIndex's frozen centroids). */
  def frameDictionary(frames: DataFrame, minDf: Int, maxDf: Int): DataFrame =
    frames.groupBy(col("frame_fp")).agg(count(lit(1)).as("df"))
      .filter(col("df") >= minDf && col("df") <= maxDf)
      .select(col("frame_fp"))

  private def expl(sets: DataFrame, idc: String, nc: String,
                   dict: DataFrame): DataFrame =
    sets.select(col("media_id").as(idc), col("n").as(nc),
        explode(col("fps")).as("frame_fp"))
      .join(dict, Seq("frame_fp"))

  /** Shared-frame candidate pairs (a_id < b_id) between two frame-set
    * frames, aggregated and Jaccard-verified. The join key is the frame
    * fingerprint, so fan-out per bucket is dictionary-capped. */
  private def verifiedPairs(a: DataFrame, b: DataFrame,
                            jNum: Int, jDen: Int): DataFrame =
    a.join(b, Seq("frame_fp"))
      .filter(col("a_id") < col("b_id"))
      .groupBy(col("a_id"), col("b_id"), col("n_a"), col("n_b"))
      .agg(count(lit(1)).as("shared"))
      .filter(col("shared") * lit(jDen.toLong) >=
        lit(jNum.toLong) * (col("n_a") + col("n_b") - col("shared")))
      .select(col("a_id"), col("b_id"), col("shared"),
        col("n_a"), col("n_b"),
        (col("shared").cast("double") /
          (col("n_a") + col("n_b") - col("shared")).cast("double"))
          .as("jaccard"))

  /** All near-dup pairs within one frame-sets frame (the batch/gate form). */
  def selfPairs(sets: DataFrame, dict: DataFrame,
                jNum: Int, jDen: Int): DataFrame =
    verifiedPairs(expl(sets, "a_id", "n_a", dict),
      expl(sets, "b_id", "n_b", dict), jNum, jDen)

  /** Pairs with AT LEAST ONE side in `fresh`, each exactly once:
    * (stored ∪ fresh) × fresh covers every pair whose b side is fresh,
    * fresh × stored covers a-fresh/b-stored — disjoint under a_id < b_id,
    * and both carry the fresh batch on one side, so candidate work is
    * batch-proportional (the SemDedup.incrementalShadowPairs scheme).
    * Sizes ride the rows, so the Jaccard denominators are the FULL
    * distinct-frame sets whatever the slicing. */
  def incrementalPairs(stored: DataFrame, fresh: DataFrame, dict: DataFrame,
                       jNum: Int, jDen: Int): DataFrame =
    verifiedPairs(expl(stored.unionByName(fresh), "a_id", "n_a", dict),
        expl(fresh, "b_id", "n_b", dict), jNum, jDen)
      .unionByName(verifiedPairs(expl(fresh, "a_id", "n_a", dict),
        expl(stored, "b_id", "n_b", dict), jNum, jDen))
}
