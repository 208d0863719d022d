package graft.streaming

import java.nio.file.{Files, Paths, StandardCopyOption}
import graft.SparkSpec
import graft.jobs.AnnIndex
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streamed ANN ingest must leave the index equal to a batch build +
  * appends of the same arrivals: the frozen centroids make assignment a
  * pure function of the vector, so the stream only has to deliver each
  * arrival exactly once into its own ingest_batch partition — which
  * foreachBatch's replayed-batchId contract plus AnnIndex.append's
  * own-partition overwrite guarantees. */
class AnnIngestStreamSpec extends SparkSpec {

  private def df(lo: Long, hi: Long): DataFrame = {
    val e = spark.read.parquet(s"$sfSmoke/embeddings.parquet")
    e.filter(col("vec_id") >= lo && col("vec_id") < hi)
      .select(col("vec_id"), col("embedding"), lit(0).as("label"))
  }

  private def addBatch(dir: java.nio.file.Path, name: String,
                       rows: DataFrame): Unit = {
    val stage = Files.createTempDirectory(s"ann_stage_$name")
    rows.coalesce(1).write.mode("overwrite").parquet(stage.toString)
    val part = Files.list(stage).toArray.map(_.toString)
      .filter(_.endsWith(".parquet")).head
    Files.copy(Paths.get(part), dir.resolve(s"$name.parquet"),
      StandardCopyOption.REPLACE_EXISTING)
  }

  test("streamed ingest equals batch appends and stays searchable") {
    val idx = Files.createTempDirectory("ann_stream_idx").toString
    AnnIndex.build(df(0, 200).select("vec_id", "embedding"),
      "vec_id", "embedding", k = 8, iters = 3, idx)

    val dir = Files.createTempDirectory("ann_stream_in")
    val ckpt = Files.createTempDirectory("ann_stream_ckpt").toString
    addBatch(dir, "b1", df(200, 300))
    val q = AnnIngestStream.ingest(spark, dir.toString, idx, ckpt)
    try {
      q.processAllAvailable()
      addBatch(dir, "b2", df(300, 400))
      q.processAllAvailable()
    } finally q.stop()

    // vectors table == the union of everything ingested, each arrival once
    val got = spark.read.parquet(s"$idx/vectors")
    assert(got.count() == 400)
    assert(got.groupBy(col("vec_id")).count()
      .filter(col("count") > 1).isEmpty, "a vector landed twice")
    // the two microbatches landed as distinct ingest partitions (1 and 2);
    // partition inference types ingest_batch as int — normalize via cast
    val batches = got.selectExpr("cast(ingest_batch as long)")
      .distinct().collect().map(_.getLong(0)).toSeq.sorted
    assert(batches == Seq(0L, 1L, 2L), s"unexpected partitions: $batches")

    // a streamed-in vector is findable as its own top hit, and the probe
    // placed it where the frozen centroids say it belongs (same kernel as
    // batch append — spot-check via search identity)
    val qv = df(350, 351).select("embedding").head().getSeq[Float](0).toArray
    val hit = AnnIndex.search(spark, idx, qv, k = 1, nProbe = 1).head()
    assert(hit.getLong(0) == 350L, s"top hit ${hit.getLong(0)}")
    assert(hit.getDouble(2) > 0.999999)
  }
}
