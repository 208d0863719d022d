package graft.streaming

import java.nio.file.{Files, Paths, StandardCopyOption}
import graft.SparkSpec
import graft.jobs.SemDeDupIndex
import graft.operators.{KMeans, SemDedup}
import org.apache.spark.sql.DataFrame

/** Streaming semantic dedup must equal the from-scratch BATCH run under
  * the frozen clustering, whatever microbatch slicing the file source
  * produces — the removals algebra is batch-additive (SemDeDupIndexSpec),
  * so the stream only has to deliver each arrival exactly once into its
  * own ingest_batch partition, which foreachBatch's replayed-batchId
  * contract guarantees. */
class SemDedupStreamSpec extends SparkSpec {

  private def vec(axis: Int, wiggle: Float): Seq[Float] = {
    val v = Array.fill(8)(0.001f)
    v(axis) = 1.0f
    v((axis + 3) % 8) = wiggle
    v.toSeq
  }

  private val all: Seq[(Long, Seq[Float])] =
    (0L until 18L).map(i => (i, vec((i % 3).toInt, 0.001f * (i / 3))))

  private def df(rows: Seq[(Long, Seq[Float])]): DataFrame = {
    import spark.implicits._
    rows.map { case (id, e) => (id, e, (id % 3).toInt) }
      .toDF("vec_id", "embedding", "label")
  }

  private def addBatch(dir: java.nio.file.Path, name: String,
                       rows: Seq[(Long, Seq[Float])]): Unit = {
    val stage = Files.createTempDirectory(s"semdedup_stage_$name")
    df(rows).coalesce(1).write.mode("overwrite").parquet(stage.toString)
    val part = Files.list(stage).toArray.map(_.toString)
      .filter(_.endsWith(".parquet")).head
    Files.copy(Paths.get(part), dir.resolve(s"$name.parquet"),
      StandardCopyOption.REPLACE_EXISTING)
  }

  private def table(d: DataFrame): Seq[(Long, Long, Long, Long)] =
    d.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3))).toSeq.sorted

  test("streamed removals equal the batch run under a 2-microbatch arrival") {
    val built = all.take(6)
    val b1 = all.slice(6, 12)
    val b2 = all.drop(12)

    val idx = Files.createTempDirectory("semdedup_stream_idx").toString
    SemDeDupIndex.build(df(built).select("vec_id", "embedding"), idx, k = 3)

    val dir = Files.createTempDirectory("semdedup_stream_in")
    val ckpt = Files.createTempDirectory("semdedup_stream_ckpt").toString
    addBatch(dir, "b1", b1)
    val q = SemDedupStream.ingestDeduped(spark, dir.toString, idx, ckpt)
    try {
      q.processAllAvailable()
      addBatch(dir, "b2", b2)
      q.processAllAvailable()
    } finally q.stop()

    // batch reference: assignTo ALL against the frozen centroids
    val cents = spark.read.parquet(s"$idx/centroids")
    val assign = KMeans.assignTo(df(all).select("vec_id", "embedding"),
      "vec_id", "embedding", cents)
    val want = table(SemDedup.removals(SemDedup.shadowPairs(
      SemDedup.members(df(all).select("vec_id", "embedding"), assign))))
    assert(want.nonEmpty, "weak fixture: no shadows at all")
    assert(table(SemDeDupIndex.removals(spark, idx)) == want)
    // the two microbatches landed as distinct ingest partitions (1 and 2)
    // partition inference types ingest_batch as int — normalize via cast
    val batches = spark.read.parquet(s"$idx/members")
      .selectExpr("cast(ingest_batch as long)").distinct().collect()
      .map(_.getLong(0)).toSeq.sorted
    assert(batches == Seq(0L, 1L, 2L), s"unexpected partitions: $batches")
  }
}
