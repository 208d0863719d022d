package graft

import org.apache.spark.sql.functions._

/** Dev tool: prove the fact-fact co-location lever at scale.
  *
  * q25's shape — lineitem ⋈ orders on the order key + interval filter +
  * bounded agg — is the one relational probe row where shuffle
  * materialization dominates at 1000× (PERF.md: 56 s engine vs 10 s for a
  * single-box in-memory engine; BOTH fact sides shuffle). The 100 TB
  * answer is not a faster shuffle, it is NO shuffle: write both facts
  * bucketed on the join key once (`Scale.writeBucketed`, spec-proven
  * exchange-free at test scale), and every subsequent join on that key is
  * map-side. This tool measures all three numbers on a real surface: the
  * one-time bucketed write, the raw shuffle join, and the bucketed join —
  * and ASSERTS the bucketed plan is exchange-free, so the lever is
  * hash-proven at whatever scale it is pointed at.
  *
  * Usage: BucketProbe <sfDir> [numBuckets]   (prints one JSON line)
  */
object BucketProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val numBuckets = if (args.length > 1) args(1).toInt else 64
    val spark = Bench.buildSession(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "true")

    def timed(body: => Long): (Double, Long) = {
      val t0 = System.nanoTime()
      val n = body
      ((System.nanoTime() - t0) / 1e9, n)
    }

    // the gated q25 body itself — ONE definition (review: a local copy had
    // already drifted in its agg expression)
    def q25 = graft.queries.RelationalQueries.q25Shape _

    val li = graft.core.Tables(spark, sfDir, "lineitem")
      .select("l_orderkey", "l_shipdate", "l_quantity")
    val os = graft.core.Tables(spark, sfDir, "orders")
      .select("o_orderkey", "o_orderdate", "o_orderpriority")

    // clear any stale prior run: a crashed probe leaves both the catalog
    // entry (derby metastore in cwd) and the warehouse dir behind, and
    // saveAsTable refuses a pre-existing managed LOCATION even in
    // overwrite mode once the table entry is gone
    for (t <- Seq("bp_lineitem", "bp_orders")) {
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(
        new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")).getPath, t)
      if (loc.exists()) {
        import scala.reflect.io.Directory
        new Directory(loc).deleteRecursively()
      }
    }

    // one-time cost: both facts bucketed on the join-key domain
    val (writeSec, _) = timed {
      graft.operators.Scale.writeBucketed(li, "bp_lineitem", "l_orderkey", numBuckets)
      graft.operators.Scale.writeBucketed(os, "bp_orders", "o_orderkey", numBuckets)
      0L
    }

    // warmup + measured pass each, same discipline as DensityProbe
    def measure(mk: => org.apache.spark.sql.DataFrame): (Double, Long) = {
      mk.count(); timed(mk.count())
    }
    val (rawSec, rawRows) = measure(q25(li, os))
    val bucketed = q25(spark.table("bp_lineitem"), spark.table("bp_orders"))
    // the lever's claim is about the JOIN: the 6-group final agg after it
    // shuffles six partial rows per task by design. Assert the join
    // subplan alone is exchange-free
    val joinOnly = spark.table("bp_lineitem")
      .join(spark.table("bp_orders"), col("l_orderkey") === col("o_orderkey"))
    require(graft.operators.Scale.isExchangeFree(joinOnly),
      s"bucketed join plan still shuffles:\n${joinOnly.queryExecution.executedPlan}")
    val (bucketSec, bucketRows) = measure(bucketed)
    // CONTENT equality of the full aggregate output, not its group count —
    // a row-count compare of a ~5-group agg would pass under millions of
    // silently dropped fact rows (review finding): every per-group measure
    // must match the raw plan's exactly
    def resultOf(df: org.apache.spark.sql.DataFrame): Seq[Seq[Any]] =
      df.orderBy(col("o_orderpriority")).collect().toSeq.map(_.toSeq)
    require(resultOf(q25(li, os)) == resultOf(bucketed),
      "bucketed q25 output drifted from the raw plan's")
    require(rawRows == bucketRows, s"row drift: raw $rawRows vs bucketed $bucketRows")

    println(s"""{"metric":"bucket_probe","sf":"$sfDir","buckets":$numBuckets,""" +
      s""""write_sec":$writeSec,"raw_join_sec":$rawSec,""" +
      s""""bucketed_join_sec":$bucketSec,"rows":$rawRows,"exchange_free":true}""")
    spark.sql("DROP TABLE IF EXISTS bp_lineitem")
    spark.sql("DROP TABLE IF EXISTS bp_orders")
    spark.stop()
  }
}
