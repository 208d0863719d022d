package graft.streaming

import java.nio.file.{Files, Paths, StandardCopyOption}
import graft.SparkSpec
import graft.jobs.FrameIndex
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streamed frame-index ingest must leave BOTH on-disk artifacts — the
  * framesets layout and the accumulated pairs log — equal to a batch
  * build + appends of the same arrivals: the frozen dictionary makes
  * each pair's verdict a pure function of its two immutable frame sets,
  * so the stream only has to deliver each arrival exactly once into its
  * own partitions, which foreachBatch's replayed-batchId contract plus
  * FrameIndex.append's own-partition overwrite guarantees. */
class FrameIngestStreamSpec extends SparkSpec {
  import spark.implicits._

  private def block(c: Char) = c.toString * 32
  private def video(s0: Char, s4: Char, s8: Char): String =
    block(s0) + block('z') * 3 + block(s4) + block('z') * 3 + block(s8)

  private def docsDf(rows: Seq[(Long, String)]): DataFrame =
    rows.map { case (id, t) => (id, t, "en", "web", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")

  private def mediaDf(rows: Seq[(Long, String)]): DataFrame =
    rows.toDF("media_id", "text")
      .select(col("media_id"), col("text").cast("binary").as("payload"))

  private def addBatch(dir: java.nio.file.Path, name: String,
                       rows: Seq[(Long, String)]): Unit = {
    val stage = Files.createTempDirectory(s"frame_stage_$name")
    docsDf(rows).coalesce(1).write.mode("overwrite").parquet(stage.toString)
    val part = Files.list(stage).toArray.map(_.toString)
      .filter(_.endsWith(".parquet")).head
    Files.copy(Paths.get(part), dir.resolve(s"$name.parquet"),
      StandardCopyOption.REPLACE_EXISTING)
  }

  private val base = Seq(
    0L -> video('A', 'B', 'C'),
    1L -> video('A', 'B', 'D'),
    2L -> video('H', 'I', 'G'))
  private val b1 = Seq(100L -> video('A', 'B', 'C'),
    101L -> video('H', 'I', 'J'))
  private val b2 = Seq(200L -> video('H', 'I', 'K'))

  test("streamed ingest equals batch appends: framesets AND pair log") {
    val idx = Files.createTempDirectory("frame_stream_idx").toString
    FrameIndex.build(mediaDf(base), idx, maxDf = 3)
    // batch reference: the same arrivals appended directly
    val refIdx = Files.createTempDirectory("frame_ref_idx").toString
    FrameIndex.build(mediaDf(base), refIdx, maxDf = 3)
    val refPairs =
      FrameIndex.append(spark, refIdx, 1L, mediaDf(b1)).collect().map(_.toSeq) ++
      FrameIndex.append(spark, refIdx, 2L, mediaDf(b2)).collect().map(_.toSeq)

    val dir = Files.createTempDirectory("frame_stream_in")
    val ckpt = Files.createTempDirectory("frame_stream_ckpt").toString
    val pairsOut = Files.createTempDirectory("frame_stream_pairs").toString
    addBatch(dir, "b1", b1)
    val q = FrameIngestStream.ingest(spark, dir.toString, idx, pairsOut, ckpt)
    try {
      q.processAllAvailable()
      addBatch(dir, "b2", b2)
      q.processAllAvailable()
    } finally q.stop()

    // framesets: every arrival exactly once, three ingest partitions
    val sets = spark.read.parquet(s"$idx/framesets")
    assert(sets.count() == (base ++ b1 ++ b2).size.toLong)
    val batches = sets.selectExpr("cast(ingest_batch as long)")
      .distinct().collect().map(_.getLong(0)).toSeq.sorted
    assert(batches == Seq(0L, 1L, 2L), s"unexpected partitions: $batches")

    // pair log: the union of the microbatch deltas equals the batch
    // appends' pairs exactly (cross-batch pair 101×200 included)
    val streamed = spark.read.parquet(pairsOut)
      .drop("ingest_batch").collect().map(_.toSeq)
    assert(streamed.toSet == refPairs.toSet,
      s"streamed pair log diverged:\n${streamed.toSet}\nvs\n${refPairs.toSet}")
    assert(streamed.exists(r => r.head == 101L && r(1) == 200L),
      "cross-batch pair missing from the streamed log")
  }
}
