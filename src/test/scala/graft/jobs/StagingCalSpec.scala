package graft.jobs

import java.time.LocalDate
import java.sql.{Date => SqlDate}
import graft.SparkSpec
import graft.core.FixedClock
import org.apache.spark.sql.functions.lit

/** Fixtures for the decarb_elec_overview assembly toolkit
  * (reference: jobs/staging_cal.py:109-283,386-984). */
class StagingCalSpec extends SparkSpec {
  import spark.implicits._

  private def d(s: String) = SqlDate.valueOf(s)
  private val p = d("2026-03-01")
  private val f1 = 0.06 / 0.94

  private def series(rows: (String, Double, Double)*) =
    rows.map { case (s, a, y) => (s, a, y, p) }
      .toDF("site", "amount", "ytm_amount", "period_start")

  test("scopeCalCurrentYear: market/location offsets and the four series") {
    val elect = series(("S1", 1000.0, 1000.0))
    val solar = series(("S1", 100.0, 100.0))
    val certs = series(("S1", 50.0, 50.0))
    val green = series(("S1", 150.0, 150.0))
    val coef = Seq(("S1", 0.5)).toDF("site", "coef")
    val sc = StagingCal.scopeCalCurrentYear(elect, solar, certs, green, coef)
    def one(df: org.apache.spark.sql.DataFrame) =
      df.select("amount").as[Double].collect().head
    assert(approx(one(sc.market), 0.35)) // (1000-300)*0.5/1000
    assert(approx(one(sc.location), 0.375)) // (1000-250)*0.5/1000
    assert(approx(one(sc.scope1All), 0.375 * f1))
    assert(approx(one(sc.scope1n2All), 0.35 + 0.375 * f1))
  }

  test("calScopeSimulate: cross and keyed percent-vs-base forms") {
    val cur = Seq((d("2026-03-01"), 110.0, 220.0))
      .toDF("period_start", "amount", "ytm_amount")
    val base = Seq((d("2022-03-01"), 100.0, 200.0))
      .toDF("period_start", "amount", "ytm_amount")
    val cross = StagingCal.calScopeSimulate(cur, base, p)
      .as[(SqlDate, Double, Double)].collect().head
    assert(cross._1 == p && approx(cross._2, 10.0) && approx(cross._3, 10.0))
    // keyed form joins on period_start: re-dated base matches
    val keyedBase = base.withColumn("period_start", lit(p))
    val keyed = StagingCal.calScopeSimulate(cur, keyedBase, p, keyed = true)
      .as[(SqlDate, Double, Double)].collect().head
    assert(keyed._1 == p && approx(keyed._2, 10.0) && approx(keyed._3, 10.0))
  }

  test("stackOverview labels, types, and splits year/month") {
    val a = series(("S1", 1.0, 2.0)).drop("site")
    val b = series(("S1", 3.0, 4.0)).drop("site")
    val got = StagingCal.stackOverview(Seq(a -> "electricity", b -> "solar"),
        "actual")
      .as[(Double, Double, String, String, Int, Int)].collect().toSet
    assert(got == Set((1.0, 2.0, "electricity", "actual", 2026, 3),
      (3.0, 4.0, "solar", "actual", 2026, 3)))
  }

  test("greenEnergyTargetGap: per-site and total REC demand") {
    val elect = series(("S1", 1000.0, 1000.0), ("S2", 500.0, 500.0))
    val solar = series(("S1", 100.0, 100.0))
    val green = series(("S1", 50.0, 50.0))
    val ratio = Seq(0.3).toDF("total_ratio")
    val perSite = StagingCal.greenEnergyTargetGap(elect, solar, green, ratio,
        perSite = true)
      .select("site", "amount").as[(String, Double)].collect().toMap
    // S1: 1000*0.3-100-50; S2 (no offsets): 500*0.3
    assert(approx(perSite("S1"), 150.0) && approx(perSite("S2"), 150.0))
    val total = StagingCal.greenEnergyTargetGap(elect, solar, green, ratio,
        perSite = false)
      .select("amount").as[Double].collect().head
    assert(approx(total, 1500.0 * 0.3 - 100.0 - 50.0))
  }

  test("ppaTarget scales the electricity target by the PPA ratio scalar") {
    val electAll = Seq((p, 1000.0, 2000.0))
      .toDF("period_start", "amount", "ytm_amount")
    val ratio = Seq(0.2).toDF("ratio")
    val got = StagingCal.ppaTarget(electAll, ratio)
      .select("amount", "ytm_amount", "category")
      .as[(Double, Double, String)].collect().head
    assert(got == ((200.0, 400.0, "PPA")))
  }

  test("calEnergySaving melts month columns, sums, and computes YTM") {
    val df = Seq((2026, 5.0, 3.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0,
      0.0, 2.0)).toDF("year", "jan", "feb", "mar", "apr", "may", "jun",
      "jul", "aug", "sep", "oct", "nov", "dec")
    val got = StagingCal.calEnergySaving(df, "actual")
      .select("period_start", "amount", "ytm_amount", "category", "type")
      .as[(SqlDate, Double, Double, String, String)].collect()
      .map(r => r._1 -> r).toMap
    assert(got(d("2026-01-01"))._2 == 5.0 && got(d("2026-01-01"))._3 == 5.0)
    assert(got(d("2026-02-01"))._2 == 3.0 && got(d("2026-02-01"))._3 == 8.0)
    assert(got(d("2026-12-01"))._3 == 10.0)
    assert(got(d("2026-06-01"))._4 == "energy_efficiency" &&
      got(d("2026-06-01"))._5 == "actual")
  }

  test("greenElecPreContracts refreshes contract rows with a stamp") {
    val clock = FixedClock(LocalDate.of(2026, 8, 1))
    val vol = Seq(
      ("S1", "P1", "Prov", "轉供", 10.0),
      ("ALL", "P1", "Prov", "轉供", 99.0), // rollup grain excluded
      ("S1", "P1", "Prov", "計費", 99.0) // wrong category
    ).toDF("site", "plant", "provider_name", "category1", "amount")
    val areaMap = Seq(("Prov", "north")).toDF("provider_name", "area")
    val contract = Seq(("Prov", 1000.0, 2026, "north", Seq("光電"), 5.0))
      .toDF("provider_name", "contract_ytm_amount", "year", "area",
        "green_elec_type", "contract_price")
    val got = StagingCal.greenElecPreContracts(vol, areaMap, contract, clock)
      .select("provider_name", "contract_ytm_amount", "year", "contract_price")
      .as[(String, Double, Int, Double)].collect().toSeq
    assert(got == Seq(("Prov", 1000.0, 2026, 5.0)))
  }

  test("greenElecPreContracts applies '光電' = ALL(green_elec_type) on the array column") {
    val clock = FixedClock(LocalDate.of(2026, 8, 1))
    val vol = Seq(("S1", "P1", "Prov", "轉供", 10.0))
      .toDF("site", "plant", "provider_name", "category1", "amount")
    val areaMap = Seq(("Prov", "north")).toDF("provider_name", "area")
    val contract = Seq(
      ("pure",     2026, Option(Seq("光電"))),          // every element matches → kept
      ("multi",    2026, Option(Seq("光電", "光電"))),  // still ALL → kept
      ("mixed",    2026, Option(Seq("光電", "風電"))),  // one off-type element → dropped
      ("other",    2026, Option(Seq("風電"))),          // no match → dropped
      ("empty",    2026, Option(Seq.empty[String])),    // Postgres = ALL: vacuous TRUE → kept
      ("nullarr",  2026, Option.empty[Seq[String]]),    // NULL array → NULL predicate → dropped
      ("lastyear", 2025, Option(Seq("光電")))           // wrong year window → dropped
    ).toDF("provider_name", "year", "green_elec_type")
      .withColumn("contract_ytm_amount", lit(1.0))
      .withColumn("area", lit("north"))
      .withColumn("contract_price", lit(2.0))
    val kept = StagingCal.greenElecPreContracts(vol, areaMap, contract, clock)
      .select("provider_name").as[String].collect().toSet
    assert(kept == Set("pure", "multi", "empty"))
  }
}
