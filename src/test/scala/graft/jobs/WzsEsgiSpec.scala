package graft.jobs

import java.sql.{Date => SqlDate}
import graft.SparkSpec

class WzsEsgiSpec extends SparkSpec {
  import spark.implicits._

  private def d(s: String) = SqlDate.valueOf(s)

  test("preprocess: NA sentinel to zero, plant recode, MWh to kWh scaling") {
    val raw = Seq(
      ("總用電度數", "LCM-1", d("2026-01-01"), "12.5"),
      ("總用電度數", "WOK-2", d("2026-01-01"), "NA"))
      .toDF("data_name", "plant", "period_start", "amount")
    val got = WzsEsgiEtl.preprocess(raw, scaleBy = 1000.0)
      .select("plant", "amount").as[(String, Double)].collect().toSet
    assert(got == Set(("WOK", 12500.0), ("WOK-2", 0.0)))
  }

  test("categoryGroup selects and sums the requested indicators") {
    val df = Seq(
      ("綠電電量", "P1", d("2026-01-01"), 5.0),
      ("購買綠證電量", "P1", d("2026-01-01"), 3.0),
      ("總用電度數", "P1", d("2026-01-01"), 100.0))
      .toDF("data_name", "plant", "period_start", "amount")
    val got = WzsEsgiEtl.categoryGroup(df, Seq("綠電電量", "購買綠證電量"))
      .select("amount").as[Double].head()
    assert(got == 8.0)
  }

  test("calEnergySaving melts wide months into YTM rows") {
    val wide = Seq((2026, 10.0, 20.0, 30.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 5.0))
      .toDF("year", "jan", "feb", "mar", "apr", "may", "jun",
        "jul", "aug", "sep", "oct", "nov", "dec")
    val got = WzsEsgiEtl.calEnergySaving(wide, "actual")
      .select("period_start", "amount", "ytm_amount", "type")
      .as[(SqlDate, Double, Double, String)].collect()
      .map(r => r._1.toString -> ((r._2, r._3))).toMap
    assert(got("2026-01-01") == ((10.0, 10.0)))
    assert(got("2026-03-01") == ((30.0, 60.0)))
    assert(got("2026-12-01") == ((5.0, 65.0)))
    assert(got.size == 12)
  }
}
