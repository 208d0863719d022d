package graft.jobs

import java.nio.file.Files
import java.time.LocalDate
import java.sql.{Date => SqlDate}
import graft.SparkSpec
import graft.core.FixedClock

/** End-to-end medallion run of the solar mini-DAG (reference:
  * jobs/solar_etl.py:15-38): raw fixtures → four staging tables +
  * elect_total → solar_energy_overview, through Pipeline error isolation
  * and dynamic-partition overwrite; re-running must be idempotent. */
class SolarEtlDagSpec extends SparkSpec {
  import spark.implicits._

  private val clock = FixedClock(LocalDate.of(2026, 8, 1))
  private def d(s: String) = SqlDate.valueOf(s)
  private val jul = d("2026-07-01")

  test("solar_etl DAG: raw to serving end-to-end, idempotent overwrite") {
    val base = Files.createTempDirectory("solar_etl").toString
    def land(df: org.apache.spark.sql.DataFrame, layer: String, t: String) =
      df.write.parquet(s"$base/$layer/$t")

    land(Seq(("S1", "P1")).toDF("site", "plant"), "raw", "plant_mapping")
    land(Seq(("P1", "actual", 10.0, jul), ("P1", "target", 20.0, jul))
      .toDF("plant", "category", "amount", "period_start"), "raw", "solar")
    land(Seq(("P1", 5.0, jul)).toDF("site", "amount", "period_start"),
      "raw", "solar_remain")
    land(Seq((jul, "P1", null.asInstanceOf[String], 1.0, 0.0))
      .toDF("period_start", "site", "area", "tree", "fuel"), "raw", "solar_other")
    land(Seq(("P1", "P1", "cap", 7.0))
      .toDF("site", "plant", "category", "amount"), "raw", "solar_info")
    land(Seq((1.0, "P1", jul)).toDF("ratio", "plant", "period_start"),
      "raw", "fem_ratio_solar")
    land(Seq.empty[(Double, String, SqlDate)]
      .toDF("ratio", "plant", "period_start"), "raw", "solar_ratio")
    land(Seq.empty[(Double, String, SqlDate)]
      .toDF("ratio", "plant", "period_start"), "raw", "fem_ratio_plant")
    land(Seq(
      ("P1", 7, 100.0, 2026, "predict", 1, true),
      ("P1", 7, 90.0, 2026, "actual", 1, true))
      .toDF("site", "month", "amount", "year", "category", "version", "validate"),
      "app", "elect_target_month")

    val notifier = new Pipeline.CollectingNotifier
    val failed = Pipeline.run(spark, SolarEtl.jobs(base, clock), notifier)
    assert(failed.isEmpty, s"failed jobs: $failed; events: ${notifier.events}")

    def overview = spark.read.parquet(s"$base/app/solar_energy_overview")
    val got = overview.select("site", "plant", "category", "amount")
      .as[(String, String, String, Double)].collect().toSet
    assert(got == Set(
      ("S1", "P1", "actual", 15.0), // actual_use 10 + remain 5
      ("S1", "P1", "target", 20.0),
      ("S1", "P1", "remain", 5.0),
      ("S1", "P1", "actual_use", 10.0),
      ("P1", "P1", "cap", 7.0), // solar_info keeps raw site codes
      ("S1", "P1", "tree", 1.0), ("S1", "P1", "fuel", 0.0),
      ("S1", "P1", "elect_total_actual", 90.0),
      ("S1", "P1", "elect_total_target", 100.0),
      ("S1", "P1", "solar_ratio_actual", 15.0 / 90.0 * 100),
      ("S1", "P1", "solar_ratio_target", 20.0)))

    // idempotency: the refresh overwrites its partitions, never duplicates
    val n1 = overview.count()
    assert(Pipeline.run(spark, SolarEtl.jobs(base, clock), notifier).isEmpty)
    assert(overview.count() == n1)
  }
}
