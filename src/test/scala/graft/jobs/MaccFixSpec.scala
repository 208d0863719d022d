package graft.jobs

import java.sql.{Date => SqlDate}
import graft.SparkSpec

class MaccFixSpec extends SparkSpec {
  import spark.implicits._

  private def d(s: String) = SqlDate.valueOf(s)

  test("fixRaw densifies the site panel with zero rows for the missing sites") {
    val cur = Seq(("S1", 10.0, d("2026-02-01"))).toDF("site", "amount", "period_start")
    val prev = Seq(("S1", 8.0, d("2025-08-01")), ("S2", 5.0, d("2025-08-01")))
      .toDF("site", "amount", "period_start")
    val got = FixData.fixRaw(cur, prev, d("2026-02-01"))
      .as[(String, Double, SqlDate)].collect().toSet
    assert(got == Set(
      ("S1", 10.0, d("2026-02-01")),
      ("S2", 0.0, d("2026-02-01"))))
  }

  test("assembleDemand: version pick, WKS/XTRKS solar split, share clips, abatement") {
    val sim = Seq(
      ("WKS", 2024, 600.0, "V2"), ("XTRKS", 2024, 400.0, "V2"),
      ("XTRKS", 2025, 500.0, "V2"), ("WCD", 2024, 1000.0, "V2"),
      ("WKS", 2024, 9999.0, "V1") // old version: excluded
    ).toDF("site", "year", "amount", "version")
    val solar = Seq(
      ("WKS/XTRKS", "target", 100.0, d("2024-03-01")),
      ("WKS/XTRKS", "target", 100.0, d("2024-06-01")),
      // 2025+: category filter deliberately absent (reference quirk)
      ("WKS/XTRKS", "actual", 50.0, d("2025-01-01")),
      ("WKS/XTRKS", "target", 70.0, d("2025-02-01")),
      ("WCD", "target", 100.0, d("2024-05-01"))
    ).toDF("plant", "category", "amount", "period_start")
    val setting = Seq((2024, "PPA", 30.0), (2025, "PPA", 90.0))
      .toDF("year", "category", "amount")
    val coef = Seq(
      ("WKS", 2024, 0.5), ("XTRKS", 2024, 0.5), ("XTRKS", 2025, 0.5),
      ("WCD", 2024, 1.0), ("WIH", 2024, 0.8)
    ).toDF("site", "year", "amount")

    val got = MaccSummary.assembleDemand(sim, solar, setting, coef)
    assert(got.count() == 4)
    val byKey = got.collect()
      .map(r => (r.getAs[String]("site"), r.getAs[Int]("year")) -> r).toMap

    // WKS 2024: demand ratio 600/1000 splits the 200 shared solar -> 120
    val wks = byKey(("WKS", 2024))
    assert(approx(wks.getAs[Double]("solar_demand"), 120.0) &&
      approx(wks.getAs[Double]("solar_rate"), 20.0) &&
      approx(wks.getAs[Double]("PPA_rate"), 30.0) &&
      approx(wks.getAs[Double]("REC_rate"), 50.0) &&
      approx(wks.getAs[Double]("PPA_demand"), 180.0) &&
      approx(wks.getAs[Double]("REC_demand"), 300.0) &&
      approx(wks.getAs[Double]("REC_abatement"), 0.15))

    // XTRKS 2025: 2025+ rollup takes actual+target (120), 24% solar;
    // REC 100-24-90 = -14 clips to 0, PPA recomputes to 76
    val xt25 = byKey(("XTRKS", 2025))
    assert(approx(xt25.getAs[Double]("solar_demand"), 120.0) &&
      approx(xt25.getAs[Double]("REC_rate"), 0.0) &&
      approx(xt25.getAs[Double]("PPA_rate"), 76.0) &&
      approx(xt25.getAs[Double]("PPA_demand"), 380.0))

    // WCD: a no-PPA site -> everything non-solar is REC
    val wcd = byKey(("WCD", 2024))
    assert(approx(wcd.getAs[Double]("PPA_rate"), 0.0) &&
      approx(wcd.getAs[Double]("REC_rate"), 90.0) &&
      approx(wcd.getAs[Double]("REC_abatement"), 0.9) &&
      approx(wcd.getAs[Double]("target_abatement"), 1.0))
  }

  test("joinGreenCosts copies WIH's price onto the Taiwan sites") {
    val demand = Seq(("N2", 2024), ("WIH", 2024)).toDF("site", "year")
    val certs = Seq(("WIH", 2024, 50.0), ("N2", 2024, 60.0))
      .toDF("site", "year", "amount")
    val elec = Seq(("WIH", 2024, 100.0)).toDF("site", "year", "amount")
    val got = MaccSummary.joinGreenCosts(demand, certs, elec)
      .select("site", "green_cer_electricity_cost", "green_electricity_diff")
      .as[(String, Double, Double)].collect().toSet
    assert(got == Set(("N2", 60.0, 100.0), ("WIH", 50.0, 100.0)))
  }

  test("MaccSummary computes discounted costs, margins, and the long layout") {
    val demand = Seq(
      // site, year, PPA_demand, REC_demand, PPA_abatement, REC_abatement,
      // green_electricity_diff (RMB/MWh), green_cer_electricity_cost (RMB/MWh)
      ("S1", 2024, 1000.0, 2000.0, 10.0, 0.0, 100.0, 50.0),
      ("S1", 2023, 999.0, 999.0, 9.0, 9.0, 100.0, 50.0) // filtered: year<=2023
    ).toDF("site", "year", "PPA_demand", "REC_demand", "PPA_abatement",
      "REC_abatement", "green_electricity_diff", "green_cer_electricity_cost")
    val fx = Seq((2024, 0.14), (2023, 0.14)).toDF("year", "rate")
    val wacc = 5.0 // percent

    val rows = MaccSummary.summarize(demand, fx, wacc)
      .select("site", "year", "amount", "lever", "item")
      .as[(String, Int, Double, String, String)].collect()

    // year 2023 excluded everywhere
    assert(rows.forall(_._2 == 2024))
    val byKey = rows.map(r => (r._4, r._5) -> r._3).toMap
    // ppa cost: 1000 * (100*0.14/1000) / 1.05^1 = 14/1.05
    assert(approx(byKey(("2.2 PPA", "減碳成本")), 14.0 / 1.05, 1e-9))
    // margin: cost/abatement
    assert(approx(byKey(("2.2 PPA", "邊際減排成本")), 14.0 / 1.05 / 10.0, 1e-9))
    // REC abatement is 0 -> margin null -> dropped: only 5 measures survive
    assert(rows.length == 5)
    assert(!byKey.contains(("2.3 Unbundled EAC", "邊際減排成本")))
  }
}
