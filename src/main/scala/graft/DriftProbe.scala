package graft

import org.apache.spark.sql.functions._
import graft.operators.FrameDedup

/** Measures [[graft.jobs.FrameIndex]]'s FROZEN-dictionary drift — the
  * round-11 verdict's open question: the candidate whitelist is computed
  * at build and only rebuild()/compact(refresh) touch it, so
  *
  *  - a fingerprint first seen AFTER build is invisible → pairs among
  *    post-build arrivals sharing only such frames are MISSED (recall
  *    drift, grows as the corpus outgrows the build half);
  *  - a build-time under-cap fingerprint the grown corpus has made
  *    boilerplate (full df > maxDf) keeps generating candidates →
  *    pairs a from-scratch build would suppress (precision drift).
  *
  * Protocol (the verdict's): build on a fraction of a decade surface's
  * v06 media, ingest the rest as one append, then compare the pair set
  * under the frozen dictionary vs a from-scratch dictionary over the
  * full corpus (both evaluated over the SAME stored frame sets, so the
  * dictionary is the only variable). Finally exercise
  * `compact(refreshDictionary = true)` and assert it restores the
  * from-scratch pair set exactly (also spec-pinned in FrameIndexSpec).
  *
  * Usage: DriftProbe [sfDir] [fractionsCsv]
  *   (defaults: /tmp/sf1d, "25,50,75" — percent of media in the build)
  */
object DriftProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/tmp/sf1d"
    val fracs = (if (args.length > 1) args(1) else "25,50,75")
      .split(",").map(_.trim.toInt).toSeq
    val spark = Bench.buildSession(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val media = graft.queries.Q.T(spark, sfDir, "documents")
      .select(col("doc_id").as("media_id"),
        coalesce(col("text"), lit("")).cast("binary").as("payload"))
      .localCheckpoint()

    def pairSet(dict: org.apache.spark.sql.DataFrame,
                sets: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      FrameDedup.selfPairs(sets, dict, jNum = 1, jDen = 2)
        .select(col("a_id"), col("b_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    for (f <- fracs) {
      val dir = java.nio.file.Files.createTempDirectory(s"drift_$f").toString
      graft.jobs.FrameIndex.build(
        media.filter(pmod(col("media_id"), lit(100)) < f), dir)
      graft.jobs.FrameIndex.append(spark, dir, 1L,
        media.filter(pmod(col("media_id"), lit(100)) >= f)).count()
      val sets = spark.read.parquet(s"$dir/framesets").drop("ingest_batch")
        .localCheckpoint()
      val frozen = pairSet(spark.read.parquet(s"$dir/dictionary"), sets)
      val fromScratch = pairSet(FrameDedup.frameDictionary(
        FrameDedup.frameFingerprints(media), minDf = 1, maxDf = 20), sets)
      val hit = (frozen & fromScratch).size
      graft.jobs.FrameIndex.compact(spark, dir, refreshDictionary = true)
      val refreshed = pairSet(spark.read.parquet(s"$dir/dictionary"), sets)
      println(f"build=$f%3d%%  fromScratch=${fromScratch.size}%6d  " +
        f"frozenHit=$hit%6d  recall=${hit.toDouble / math.max(1, fromScratch.size)}%.4f  " +
        f"frozenExtra=${(frozen -- fromScratch).size}%5d  " +
        f"refreshRestores=${refreshed == fromScratch}")
    }
    spark.stop()
  }
}
