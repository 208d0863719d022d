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
