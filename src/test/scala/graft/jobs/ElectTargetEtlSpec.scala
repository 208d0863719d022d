package graft.jobs

import java.sql.{Date => SqlDate}
import graft.SparkSpec

/** Scope projection fixtures (reference: jobs/elect_target_etl.py),
  * including the collapsed 8-year loop's year−1 self-join. */
class ElectTargetEtlSpec extends SparkSpec {
  import spark.implicits._

  private def sim = Seq(
    ("S1", 2026, 1000.0, 2, 2026), ("S2", 2026, 500.0, 2, 2026),
    ("S1", 2027, 900.0, 2, 2026),
    ("S1", 2026, 9999.0, 1, 2026), // old version: excluded
    ("S1", 2026, 8888.0, 2, 2025) // old version_year: excluded
  ).toDF("site", "year", "amount", "version", "version_year")

  private def coef = Seq(
    (2026, "S1", 0.5), (2026, "S2", 0.8), (2027, "S1", 0.5),
    (2026, "S1", 0.5) // duplicate row: dropDuplicates
  ).toDF("year", "site", "coef")

  private def setting = Seq(
    (2026, "PPA", 10.0), (2026, "solar", 10.0), (2026, "REC", 20.0),
    (2027, "PPA", 20.0), (2027, "REC", 30.0)
  ).toDF("year", "category", "amount")

  private val f1 = 0.06 / 0.94

  test("scopeCalYears: latest version, grid ratios, coefficient tonnage") {
    val sc = ElectTargetEtl.scopeCalYears(coef, sim, setting)
    val loc = sc.location.as[(Int, Double)].collect().toMap
    val mkt = sc.market.as[(Int, Double)].collect().toMap
    // 2026 location ratio 0.8: S1 1000*0.8*0.5/1000=0.4, S2 500*0.8*0.8/1000=0.32
    assert(approx(loc(2026), 0.72) && approx(mkt(2026), 0.54))
    // 2027: location 0.8 market 0.5, S1 only
    assert(approx(loc(2027), 0.36) && approx(mkt(2027), 0.225))
    val s12 = sc.scope1n2.as[(Int, Double)].collect().toMap
    assert(approx(s12(2026), 0.72 * f1 + 0.54))
    assert(approx(s12(2027), 0.36 * f1 + 0.225))
  }

  test("decarbRenewSetting: scope rows + three simulate percentages, SBTi self-join") {
    val overview = Seq(
      (2022, 12, "scope1", "actual", 2.0),
      (2022, 12, "scope2_location", "actual", 3.0),
      (2022, 12, "scope2_market", "actual", 4.0),
      (2022, 11, "scope2_market", "actual", 99.0), // wrong month
      (2022, 12, "scope2_market", "predict", 99.0) // wrong type
    ).toDF("year", "month", "category", "type", "ytm_amount")
    val base = ElectTargetEtl.baseScopeFromOverview(overview)
    assert(base.scope1n2.as[(Int, Double)].collect().toMap == Map(2022 -> 6.0))

    val prior = Seq((2025, 5.0)).toDF("year", "amount")
    val got = ElectTargetEtl.decarbRenewSetting(coef, sim, setting, base,
        prior, Seq(2026, 2027))
      .select("year", "category", "amount")
      .as[(Int, String, Double)].collect()
      .groupBy(t => (t._1, t._2)).map { case (k, v) => k -> v.head._3 }

    assert(got.size == 12) // 6 categories x 2 years
    val s26 = 0.72 * f1 + 0.54
    val s27 = 0.36 * f1 + 0.225
    assert(approx(got((2026, "scope2_location")), 0.72))
    assert(approx(got((2026, "scope2_market")), 0.54))
    assert(approx(got((2026, "scope1")), 0.72 * f1))
    assert(approx(got((2026, "scope2_decarb_simulate")), (0.54 / 4.0 - 1) * 100))
    assert(approx(got((2026, "scope1n2_decarb_simulate")), (s26 / 6.0 - 1) * 100))
    // first year's SBTi uses the external predecessor...
    assert(approx(got((2026, "scope1n2_decarb_simulate_sbti")), (s26 / 5.0 - 1) * 100))
    // ...later years chain off the in-plan year-1 total (the reference's
    // write-then-read-back through staging.renewable_setting)
    assert(approx(got((2027, "scope1n2_decarb_simulate_sbti")), (s27 / s26 - 1) * 100))
  }

  test("baseScopeFromStaging: electricity minus renewables at the base period") {
    val p = SqlDate.valueOf("2022-12-01")
    val elect = Seq(("S1", 1000.0, p), ("S2", 500.0, p))
      .toDF("site", "amount", "period_start")
    val solar = Seq(("S1", 100.0, p)).toDF("site", "amount", "period_start")
    val energy = Seq(("S1", 50.0, p)).toDF("site", "amount", "period_start")
    val grelect = Seq(("S1", 150.0, p)).toDF("site", "amount", "period_start")
    val coefB = Seq(("S1", 0.5), ("S2", 0.8)).toDF("site", "coef")
    val (loc, mkt, s1, s12) = ElectTargetEtl.baseScopeFromStaging(
      elect, solar, energy, grelect, coefB)
    // market: S1 (1000-300)*0.5/1000=0.35, S2 500*0.8/1000=0.40
    assert(approx(mkt.as[(SqlDate, Double)].collect().head._2, 0.75))
    // location: S1 (1000-250)*0.5/1000=0.375, S2 0.40
    assert(approx(loc.as[(SqlDate, Double)].collect().head._2, 0.775))
    assert(approx(s1.as[(SqlDate, Double)].collect().head._2, 0.775 * f1))
    assert(approx(s12.as[(SqlDate, Double)].collect().head._2, 0.775 * f1 + 0.75))
  }
}
