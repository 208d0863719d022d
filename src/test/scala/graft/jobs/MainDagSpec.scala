package graft.jobs

import java.nio.file.Files
import java.sql.{Date => SqlDate}
import java.time.LocalDate
import graft.SparkSpec
import graft.core.FixedClock
import org.apache.spark.sql.functions._

/** The full main.py DAG over a seeded parquet warehouse: the
  * electricity/renewable flagship chain (ESGI + CSR sources → repair →
  * staging) must run end-to-end, steps whose inputs are not seeded must
  * fail ISOLATED (reported, DAG continues — the reference's error model),
  * and the job order must match main.py:29-113. */
class MainDagSpec extends SparkSpec {
  import spark.implicits._

  private def d(s: String) = SqlDate.valueOf(s)
  private val clock = FixedClock(LocalDate.of(2026, 2, 15)) // reporting month 2026-01

  test("flagship chain succeeds; unseeded steps fail isolated; order matches") {
    val base = Files.createTempDirectory("maindag").toString
    def seed(table: String)(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.parquet(s"$base/raw/$table")

    seed("wzs_esgi_environment_indicator_item")(Seq(
      ("總用電度數", "P1", d("2026-01-01"), "12.5"),
      ("綠電電量", "P1", d("2026-01-01"), "3.0"),
      ("購買綠證電量", "P2", d("2026-01-01"), "NA"),
      ("自建自用電量", "P2", d("2026-01-01"), "2.0")
    ).toDF("data_name", "plant", "period_start", "amount"))
    seed("plant_mapping")(Seq(("P1", "S1"), ("P2", "S2"))
      .toDF("plant", "site"))
    seed("electricity_backstage_office")(Seq(
      ("S1", d("2026-01-01"), 7.0)).toDF("site", "period_start", "amount"))
    seed("wzks_office_mirror")(Seq(
      ("WZS", d("2026-01-01"), 5.0)).toDF("site", "period_start", "amount"))
    seed("electricity_backstage_update")(Seq(
      ("S1", d("2026-01-01"), 100.0), ("S1", d("2025-07-01"), 90.0))
      .toDF("site", "period_start", "amount"))
    seed("wzks_csr_mirror")(Seq(
      ("WZS", d("2026-01-01"), 40.0), ("WKS", d("2025-07-01"), 30.0))
      .toDF("site", "period_start", "amount"))
    seed("whq_esgcsrdatabase_view_csrindicatordetail_all")(Seq(
      ("S1", "2026", "1", 20.0, "光伏", "x"),
      ("S1", "2025", "7", 15.0, "綠電", "x"),
      ("S2", "2026", "1", 10.0, "轉供綠電總電量", "x"))
      .toDF("site", "year", "month", "amount", "category2", "remark"))
    seed("boundary_sites")(Seq("S1", "S2", "WZS", "WKS").toDF("site"))

    val notifier = new Pipeline.CollectingNotifier
    val failed = MainDag.run(spark, base, clock, notifier)

    // order: the notifier saw every job, in main.py order
    val names = MainDag.jobs(base, clock).map(_.name)
    assert(notifier.events.size == names.size)
    assert(names.take(3) == Seq("source_to_raw:esgi2raw",
      "source_to_raw:office2raw", "source_to_raw:esgi2solar"))
    assert(names.last == "macc_input_to_summary")

    // the seeded flagship chain ran clean
    val mustPass = Seq("source_to_raw:esgi2raw", "source_to_raw:office2raw",
      "source_to_raw:esgi2solar", "source_to_raw:csr_replace:electricity",
      "source_to_raw:csr_replace:renewable", "fix_data:fix_raw:renewable",
      "fix_data:fix_raw_elect_decarb", "raw_to_staging:electricity_decarb",
      "raw_to_staging:renewable_energy_decarb", "raw_to_staging:solar")
    val failedSet = failed.toSet
    mustPass.foreach(j => assert(!failedSet.contains(j), s"$j failed: " +
      notifier.events.filter(_._2.startsWith(j)).mkString("; ")))

    // unseeded steps failed but did NOT halt the DAG (all jobs attempted)
    assert(failedSet.nonEmpty)
    assert(failedSet.contains("macc_input_to_summary"))

    // the staging flagship table materialized with both source slices merged
    val stg = spark.read.parquet(s"$base/staging/electricity_decarb")
    assert(stg.count() > 0)
    val s1jan = stg.filter(col("site") === "S1").agg(sum("amount"))
      .as[Double].head()
    // ESGI 12.5 MWh -> 12500 + office 7 + CSR 100 (+ solar 20 added by the
    // electricity_decarb coalesce) summed across S1 rows
    assert(s1jan > 0.0)
  }

  test("green_elec_pre_contracts self-refresh: array '= ALL' + keyed swap, prior year untouched") {
    val base = Files.createTempDirectory("maindag_gepc").toString
    val old = java.sql.Timestamp.valueOf("2025-12-31 00:00:00")
    // the app table BEFORE the cron run (reference reads it back itself):
    // one all-光電 current-year row (refreshed), one mixed-type row (the
    // '= ALL' predicate excludes it from delete AND refresh), one
    // prior-year row (outside the year window entirely)
    Seq(
      ("Prov", 1000.0, 2026, "north", Option(Seq("光電")), 5.0, old),
      ("ProvMixed", 800.0, 2026, "north", Option(Seq("光電", "風電")), 3.0, old),
      // NULL array: '光電' = ALL(NULL) is NULL in Postgres — neither
      // refreshed NOR deleted; a bare !matches filter would lose this row
      ("Prov", 700.0, 2026, "south", Option.empty[Seq[String]], 2.0, old),
      ("Prov", 900.0, 2025, "north", Option(Seq("光電")), 4.0, old))
      .toDF("provider_name", "contract_ytm_amount", "year", "area",
        "green_elec_type", "contract_price", "last_update_time")
      .write.partitionBy("year").parquet(s"$base/app/green_elec_pre_contracts")
    Seq(("S1", "P1", "Prov", "轉供", 10.0))
      .toDF("site", "plant", "provider_name", "category1", "amount")
      .write.parquet(s"$base/staging/green_elect_vol")
    Seq(("Prov", "north")).toDF("provider_name", "area")
      .write.parquet(s"$base/raw/area_mapping")

    MainDag.jobs(base, clock)
      .find(_.name == "staging_cal:green_elec_pre_contracts").get.run(spark)

    val out = spark.read.parquet(s"$base/app/green_elec_pre_contracts")
      .select("provider_name", "year", "contract_ytm_amount", "last_update_time")
      .as[(String, Int, Double, java.sql.Timestamp)].collect().toSet
    val fresh = java.sql.Timestamp.valueOf("2026-02-15 00:00:00")
    assert(out == Set(
      ("Prov", 2026, 1000.0, fresh),      // refreshed: new stamp
      ("ProvMixed", 2026, 800.0, old),    // mixed array: kept verbatim
      ("Prov", 2026, 700.0, old),         // NULL array: kept verbatim
      ("Prov", 2025, 900.0, old)),        // prior year: partition untouched
      s"unexpected table state: $out")
  }

  test("green_elec_pre_contracts on a fresh warehouse is a no-op, not a permanent failure") {
    val base = Files.createTempDirectory("maindag_gepc_fresh").toString
    Seq(("S1", "P1", "Prov", "轉供", 10.0))
      .toDF("site", "plant", "provider_name", "category1", "amount")
      .write.parquet(s"$base/staging/green_elect_vol")
    Seq(("Prov", "north")).toDF("provider_name", "area")
      .write.parquet(s"$base/raw/area_mapping")
    // no app table seeded: the reference's empty-input guard fires
    MainDag.jobs(base, clock)
      .find(_.name == "staging_cal:green_elec_pre_contracts").get.run(spark)
    assert(!new java.io.File(s"$base/app/green_elec_pre_contracts").exists(),
      "no-op run must not create the table")
  }
}
