package graft.jobs

import graft.SparkSpec
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

/** The IVF disk layout must (a) preserve the corpus, (b) prune the scan to
  * exactly the probed cluster directories, and (c) return exactly the
  * exact-integer top-k within the probed clusters (scalar reference). */
class AnnIndexSpec extends SparkSpec {

  private def quant(v: Array[Float]): Array[Long] =
    v.map(x => math.floor(x * 1000.0 + 0.5).toLong)

  test("build preserves the corpus; search prunes to nProbe files and matches the reference") {
    val e = spark.read.parquet(s"$sfSmoke/embeddings.parquet")
    val path = java.nio.file.Files.createTempDirectory("ann_index").toString

    val counts = AnnIndex.build(e, "vec_id", "embedding", k = 8, iters = 3, path)
    assert(counts.agg(sum(col("n_vectors"))).head().getLong(0) == e.count())

    val qv = e.filter(col("vec_id") === 7)
      .select(col("embedding")).head().getSeq[Float](0).toArray
    val res = AnnIndex.search(spark, path, qv, k = 5, nProbe = 2)
    val rows = res.collect()
    assert(rows.length == 5)
    // the query vector's own row is in the nearest probed cluster: rank 1
    assert(rows.head.getLong(0) == 7L)
    assert(rows.map(_.getDouble(2)).sliding(2).forall(p => p(0) >= p(1)))

    // pruning: the executed scan read exactly the 2 probed directories
    // (build co-locates each cluster into one file)
    val scan = res.queryExecution.executedPlan.collect {
      case f: FileSourceScanExec => f
    }.head
    assert(scan.metrics("numFiles").value == 2L,
      s"expected 2 files read, got ${scan.metrics("numFiles").value}")

    // scalar reference: exact-integer cosine over the probed clusters only
    val probes = AnnIndex.probeClusters(spark, path, quant(qv), 2).toSet
    val stored = spark.read.parquet(s"$path/vectors")
      .select(col("vec_id"), col("cluster").cast("long"), col("embedding"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), quant(r.getSeq[Float](2).toArray)))
    val q = quant(qv)
    def cos(a: Array[Long]): Double =
      a.zip(q).map { case (x, y) => x * y }.sum.toDouble /
        (math.sqrt(a.map(x => x * x).sum.toDouble) *
          math.sqrt(q.map(x => x * x).sum.toDouble))
    val expected = stored.filter(s => probes.contains(s._2))
      .map { case (id, _, a) => (-cos(a), id) }.sorted.take(5).map(_._2).toSeq
    assert(rows.map(_.getLong(0)).toSeq == expected)
  }

  test("append assigns to the scalar-nearest centroid and stays searchable") {
    val e = spark.read.parquet(s"$sfSmoke/embeddings.parquet")
    val path = java.nio.file.Files.createTempDirectory("ann_index_append").toString

    // build on the first half, append the second half without retraining
    val base = e.filter(col("vec_id") % 2 === 0)
    val extra = e.filter(col("vec_id") % 2 === 1)
    AnnIndex.build(base, "vec_id", "embedding", k = 8, iters = 3, path)
    val counts = AnnIndex.append(spark, path, 1L, extra)
    // append reports the increment's counts (no full-index rescan)...
    assert(counts.agg(sum(col("n_appended"))).head().getLong(0) == extra.count())
    // ...and the layout now holds the whole corpus
    assert(spark.read.parquet(s"$path/vectors").count() == e.count())

    // crash/replay idempotence: re-delivering the SAME batch id (the
    // foreachBatch restart contract) overwrites its own partition —
    // no duplicate vectors, same corpus
    AnnIndex.append(spark, path, 1L, extra)
    val after = spark.read.parquet(s"$path/vectors")
    assert(after.count() == e.count(), "replayed append duplicated vectors")
    assert(after.groupBy(col("vec_id")).count()
      .filter(col("count") > 1).isEmpty, "duplicate vec_ids after replay")

    // every appended vector landed in the cluster a scalar nearest-centroid
    // scan picks (ties to lower id, like the trainer)
    val cents = spark.read.parquet(s"$path/centroids").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
      .groupBy(_._1).map { case (c, xs) => c -> xs.sortBy(_._2).map(_._3) }
    def nearest(v: Array[Long]): Long =
      cents.toSeq.map { case (c, cv) =>
        (cv.zip(v).map { case (a, b) => (a - b) * (a - b) }.sum, c)
      }.min._2
    val placed = spark.read.parquet(s"$path/vectors")
      .filter(col("vec_id") % 2 === 1)
      .select(col("vec_id"), col("cluster").cast("long"), col("embedding"))
      .collect()
    assert(placed.length == extra.count())
    placed.foreach { r =>
      assert(r.getLong(1) == nearest(quant(r.getSeq[Float](2).toArray)),
        s"vec ${r.getLong(0)} in cluster ${r.getLong(1)}")
    }

    // an appended vector is findable as its own top hit through the probe
    val qv = extra.orderBy(col("vec_id")).select(col("embedding"))
      .head().getSeq[Float](0).toArray
    val hit = AnnIndex.search(spark, path, qv, k = 1, nProbe = 1).head()
    assert(hit.getDouble(2) > 0.999999)
  }

  test("compact folds the LSM batches back to one file per cluster, search-identically") {
    val e = spark.read.parquet(s"$sfSmoke/embeddings.parquet")
    val path = java.nio.file.Files.createTempDirectory("ann_index_compact").toString

    AnnIndex.build(e.filter(col("vec_id") % 3 === 0),
      "vec_id", "embedding", k = 8, iters = 3, path)
    AnnIndex.append(spark, path, 1L, e.filter(col("vec_id") % 3 === 1))
    AnnIndex.append(spark, path, 2L, e.filter(col("vec_id") % 3 === 2))

    val qv = e.filter(col("vec_id") === 11)
      .select(col("embedding")).head().getSeq[Float](0).toArray
    val before = AnnIndex.search(spark, path, qv, k = 5, nProbe = 2)
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toSeq

    assert(AnnIndex.compact(spark, path) == Seq(1L, 2L))

    // content preserved, single batch partition, search identical
    val after = spark.read.parquet(s"$path/vectors")
    assert(after.count() == e.count())
    assert(after.selectExpr("cast(ingest_batch as long)").distinct()
      .collect().map(_.getLong(0)).toSeq == Seq(0L))
    val res = AnnIndex.search(spark, path, qv, k = 5, nProbe = 2)
    assert(res.collect().map(r => (r.getLong(0), r.getDouble(2))).toSeq == before)
    // probe I/O is back to one file per probed cluster
    val scan = res.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.head
    assert(scan.metrics("numFiles").value == 2L,
      s"expected 2 files read, got ${scan.metrics("numFiles").value}")
    // idempotent when already compact
    assert(AnnIndex.compact(spark, path).isEmpty)

    // crash healing: a compact that died between its write and its deletes
    // leaves duplicate copies in higher batches — simulate by re-landing
    // half the corpus as a stray batch, then compact must fold to a
    // duplicate-free single partition
    AnnIndex.append(spark, path, 3L, e.filter(col("vec_id") % 3 === 1))
    assert(spark.read.parquet(s"$path/vectors").count() > e.count())
    assert(AnnIndex.compact(spark, path) == Seq(3L))
    val healed = spark.read.parquet(s"$path/vectors")
    assert(healed.count() == e.count(), "heal left duplicates")
    assert(healed.groupBy(col("vec_id")).count()
      .filter(col("count") > 1).isEmpty)
  }
}
