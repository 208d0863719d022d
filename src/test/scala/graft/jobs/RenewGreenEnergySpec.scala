package graft.jobs

import java.time.LocalDate
import java.sql.{Date => SqlDate}
import graft.SparkSpec
import graft.core.{DecarbDate, FixedClock}

/** Quarterly green-energy overview fixtures (reference:
  * jobs/renew_green_energy.py), driven through the Q1-rollover branch: a
  * February clock reports last year's Q4 over the whole previous year. */
class RenewGreenEnergySpec extends SparkSpec {
  import spark.implicits._

  private def d(s: String) = SqlDate.valueOf(s)

  private val febClock = FixedClock(LocalDate.of(2026, 2, 15))

  private def setting = Seq(
    (2025, "solar", 10.0), (2025, "PPA", 15.0), (2025, "REC", 5.0),
    (2025, "other", 99.0), (2024, "solar", 50.0)
  ).toDF("year", "category", "amount")

  private def customerAmounts = Seq(
    // the entered customer row (feeds the netting and the rollup)
    (2025, 4, "AreaA", "S1", "CustX", 200.0, 20.0, 40.0, 5.0, 60.0, 140.0,
      7.0, 3.0, 2.0, "cnote"),
    // remark carrier for the site-grain row (customer='')
    (2025, 4, "AreaA", "S1", "", 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0,
      0.0, "snote")
  ).toDF("year", "quarter", "area", "site", "customer", "total_elect",
    "solar", "green_elect", "green_energy", "target_renew", "grey_elect",
    "predict_price", "green_energy_request", "actual_amount", "remark")

  test("Q1 rollover: February reports a single Q4 window over last year") {
    val qs = DecarbDate.reportingQuarters(febClock)
    assert(qs == Seq(DecarbDate.QuarterWindow(2025, "Q4", 4,
      LocalDate.of(2025, 1, 1), LocalDate.of(2025, 12, 1))))
  }

  test("summarizeQuarter: staging minus customer rows, demand clip, area rollup") {
    val qw = DecarbDate.reportingQuarters(febClock).head
    val elect = Seq(
      ("ALL", "S1", 100.0, 1200.0, d("2025-12-01")),
      ("ALL", "S2", 50.0, 600.0, d("2025-12-01")),
      ("BO1", "S1", 9.0, 9999.0, d("2025-12-01")), // bo != ALL: excluded
      ("ALL", "ALL", 9.0, 9999.0, d("2025-12-01")) // site ALL: excluded
    ).toDF("bo", "site", "amount", "ytm_amount", "period_start")
    val renew = Seq(
      ("ALL", "S1", "solar_energy", 10.0, 120.0, d("2025-12-01")),
      ("ALL", "S1", "green_electricity", 20.0, 240.0, d("2025-12-01")),
      // certificates: in-window amounts, not closing YTM
      ("ALL", "S1", "green_energy", 30.0, 30.0, d("2025-06-01")),
      ("ALL", "S1", "green_energy", 15.0, 45.0, d("2025-11-01"))
    ).toDF("bo", "site", "category", "amount", "ytm_amount", "period_start")
    val purchase = Seq((2025, "S2", "Q4", "-", 1.5, 7.0))
      .toDF("year", "site", "quarter", "customer", "unit_price", "amount")
    val areaMap = Seq((2025, "S1", "AreaA")).toDF("year", "site", "area")

    val got = RenewGreenEnergy.summarizeQuarter(setting, elect, renew,
      customerAmounts, purchase, areaMap, qw)
    assert(got.count() == 4)

    val s1 = got.filter($"site" === "S1").collect().head
    // total 1200-200; solar 120-20; grelect 240-40; certs 30+15;
    // target 1000*0.30; grey 1000-100-200; demand 300-100-200-45 clipped 0
    assert(s1.getAs[Double]("total_elect") == 1000.0 &&
      s1.getAs[Double]("grey_elect") == 700.0 &&
      s1.getAs[Double]("target_renew") == 300.0 &&
      s1.getAs[Double]("green_energy") == 45.0 &&
      s1.getAs[Double]("green_energy_request") == 0.0 &&
      approx(s1.getAs[Double]("ratio"), 4.5) &&
      s1.getAs[String]("area") == "AreaA" &&
      s1.getAs[String]("remark") == "snote")

    val s2 = got.filter($"site" === "S2").collect().head
    // unmapped area -> 其他; request 180; priced by the site-level purchase
    assert(s2.getAs[String]("area") == "其他" &&
      s2.getAs[Double]("green_energy_request") == 180.0 &&
      s2.getAs[Double]("unit_price") == 1.5 &&
      s2.getAs[Double]("predict_price") == 270.0 &&
      s2.getAs[Double]("actual_amount") == 7.0)

    val rollA = got.filter($"site" === "ALL" && $"area" === "AreaA").collect().head
    // site row + customer row: 1000+200, certs 45+5, predict 0+7
    assert(rollA.getAs[String]("customer") == "ALL" &&
      rollA.getAs[Double]("total_elect") == 1200.0 &&
      rollA.getAs[Double]("green_energy") == 50.0 &&
      rollA.getAs[Double]("predict_price") == 7.0 &&
      approx(rollA.getAs[Double]("ratio"), 50.0 / 1200.0 * 100))

    val rollO = got.filter($"site" === "ALL" && $"area" === "其他").collect().head
    assert(rollO.getAs[Double]("total_elect") == 600.0 &&
      rollO.getAs[Double]("predict_price") == 270.0)
  }

  test("addCustomerData: customer-grain re-derivation with certificates zeroed") {
    val qw = DecarbDate.reportingQuarters(febClock).head
    val purchase = Seq((2025, "S1", "Q4", "CustX", 2.0, 9.0))
      .toDF("year", "site", "quarter", "customer", "unit_price", "amount")
    val got = RenewGreenEnergy.addCustomerData(setting, customerAmounts,
      purchase, qw).collect()
    assert(got.length == 1)
    val r = got.head
    // elect 200: target 60, grey 200-20-40=140, demand 60-20-40-0=0
    assert(r.getAs[String]("customer") == "CustX" &&
      r.getAs[Double]("target_renew") == 60.0 &&
      r.getAs[Double]("grey_elect") == 140.0 &&
      r.getAs[Double]("green_energy_request") == 0.0 &&
      r.getAs[Double]("unit_price") == 2.0 &&
      r.getAs[Double]("actual_amount") == 9.0 &&
      r.getAs[Double]("ratio") == 0.0 &&
      r.getAs[String]("remark") == "cnote")
  }
}
