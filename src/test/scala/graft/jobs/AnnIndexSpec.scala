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
}
