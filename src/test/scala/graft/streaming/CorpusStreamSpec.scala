package graft.streaming

import java.nio.file.{Files, Paths, StandardCopyOption}
import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The streaming corpus ingest must apply the batch pipeline's clean gates,
  * drop exact duplicates ACROSS micro-batches (state, not per-batch
  * dedup), and append each admitted doc to the warehouse exactly once. */
class CorpusStreamSpec extends SparkSpec {
  import spark.implicits._

  // 12 4-letter words: n_tok=12 in [10,200], alpha_ratio 48/59 ≈ 0.814 ≥ 0.81
  private def mkText(seed: String): String =
    (1 to 12).map(i => s"${seed.charAt(i % seed.length)}abc").mkString(" ")

  private def addBatch(dir: java.nio.file.Path, name: String,
                       rows: Seq[(Long, String, String, String, Long)]): Unit = {
    val stage = Files.createTempDirectory(s"corpus_stage_$name")
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(stage.toString)
    val part = Files.list(stage).toArray.map(_.toString)
      .filter(_.endsWith(".parquet")).head
    Files.copy(Paths.get(part), dir.resolve(s"$name.parquet"),
      StandardCopyOption.REPLACE_EXISTING)
  }

  test("cross-batch dedup: a duplicate arriving in a later batch is dropped") {
    val dir = Files.createTempDirectory("corpus_stream")
    val wh = Files.createTempDirectory("corpus_wh").toString
    val ckpt = Files.createTempDirectory("corpus_ckpt").toString
    val t1 = mkText("one"); val t2 = mkText("two"); val t4 = mkText("four")

    addBatch(dir, "b1", Seq(
      (1L, t1, "en", "web", t1.length.toLong),
      (2L, t2, "en", "web", t2.length.toLong),
      (3L, "too short", "en", "web", 9L))) // fails the clean gate
    val q = CorpusStream.ingestToWarehouse(spark, dir.toString, wh, ckpt)
    try {
      q.processAllAvailable()
      addBatch(dir, "b2", Seq(
        (4L, t4, "en", "books", t4.length.toLong),
        (5L, t1, "en", "web", t1.length.toLong))) // exact dup of doc 1
      q.processAllAvailable()
    } finally q.stop()

    val got = spark.read.parquet(wh)
      .select(col("doc_id"), col("fp"), col("source"))
      .as[(Long, String, String)].collect()
    // doc 3 cleaned out, doc 5 deduped against batch-1 state, no double-writes
    assert(got.map(_._1).sorted.toSeq == Seq(1L, 2L, 4L))
    assert(got.map(_._2).distinct.length == 3)
    // the partitioned layout carries the source key
    assert(got.filter(_._1 == 4L).head._3 == "books")
  }

  test("restart from the checkpoint restores dedup state — no re-admission") {
    val dir = Files.createTempDirectory("corpus_restart")
    val wh = Files.createTempDirectory("corpus_restart_wh").toString
    val ckpt = Files.createTempDirectory("corpus_restart_ckpt").toString
    val t1 = mkText("alpha"); val t6 = mkText("beta")

    addBatch(dir, "b1", Seq((1L, t1, "en", "web", t1.length.toLong)))
    val q1 = CorpusStream.ingestToWarehouse(spark, dir.toString, wh, ckpt)
    try q1.processAllAvailable() finally q1.stop()

    // a NEW query on the SAME checkpoint: the dropDuplicates state must be
    // restored, so the duplicate of doc 1 arriving after the restart drops
    addBatch(dir, "b2", Seq(
      (6L, t6, "en", "web", t6.length.toLong),
      (7L, t1, "en", "web", t1.length.toLong))) // dup of pre-restart doc 1
    val q2 = CorpusStream.ingestToWarehouse(spark, dir.toString, wh, ckpt)
    try q2.processAllAvailable() finally q2.stop()

    val got = spark.read.parquet(wh).select(col("doc_id"))
      .as[Long].collect().sorted.toSeq
    assert(got == Seq(1L, 6L))
  }

  test("streaming admit set equals the batch clean+dedup on the real corpus") {
    val dir = Files.createTempDirectory("corpus_stream_full")
    Files.copy(Paths.get(s"$sfSmoke/documents.parquet"),
      dir.resolve("documents.parquet"), StandardCopyOption.REPLACE_EXISTING)
    val got = CorpusStream.runOnce(spark, dir.toString, "corpus_stream_full")
      .select(col("fp")).as[String].collect().toSet

    // the REAL batch gate (shared definition), not an inline re-statement
    val batch = graft.jobs.CorpusPipeline.clean(
        spark.read.parquet(s"$sfSmoke/documents.parquet"))
      .select(md5(col("text")).as("fp")).distinct()
      .as[String].collect().toSet
    assert(got == batch && got.nonEmpty)
  }
}
