package graft.jobs

import java.sql.{Date => SqlDate}
import graft.SparkSpec

class CsrStatusSpec extends SparkSpec {
  import spark.implicits._

  private def d(s: String) = SqlDate.valueOf(s)

  test("CsrEtl.electricity aliases plants to sites, sums, and appends the mirror") {
    val backstage = Seq(
      ("WIHK-1", d("2026-01-01"), 10.0), ("WIHK-2", d("2026-01-01"), 5.0),
      ("WHC", d("2026-01-01"), 99.0), // excluded site
      ("WCD-1", d("2026-01-01"), -1.0)) // non-positive
      .toDF("site", "period_start", "amount")
    val mirror = Seq(("WZS", d("2026-01-01"), 100.0), ("WXX", d("2026-01-01"), 7.0))
      .toDF("site", "period_start", "amount")
    val got = CsrEtl.electricity(backstage, mirror)
      .select("site", "amount", "type").as[(String, Double, String)]
      .collect().toSet
    assert(got == Set(("WIHK", 15.0, "CSR"), ("WZS", 100.0, "CSR")))
  }

  test("CsrEtl.renewable builds period_start from string parts and decodes categories") {
    val ind = Seq(("1", "轉供綠電總電量", 8.0, "2026", "WIHK1"))
      .toDF("month", "category2", "amount", "year", "site")
      .select($"month", $"category2", $"amount", $"year", $"site")
    val got = CsrEtl.renewable(ind)
      .select("category1", "category2", "site", "period_start")
      .as[(String, String, String, SqlDate)].head()
    assert(got == (("綠色能源", "綠電", "WIHK", d("2026-01-01"))))
  }

  test("SourceStatus flags missing feeds with null type and labels sources") {
    val elec = Seq(("S1", d("2026-01-01"), "CSR")).toDF("site", "period_start", "type")
    val renew = Seq(("S1", "光伏", d("2026-01-01"), "wzs_esgi"))
      .toDF("site", "category2", "period_start", "type")
    val mapping = Seq(("catA", "S1")).toDF("site_category", "site")
    val checklist = Seq(
      ("catA", "S1", "實際用電", 2026, 1, true),
      ("catA", "S1", "自建太陽能", 2026, 1, true),
      ("catA", "S1", "直購綠電", 2026, 1, false)) // nothing arrived
      .toDF("site_category", "site", "item", "year", "month", "confirm")

    val got = SourceStatus.statusReport(elec, renew, mapping, checklist)
      .select("item", "type").collect()
      .map(r => r.getString(0) -> Option(r.getString(1))).toMap
    assert(got("實際用電").contains("ESG Database"))
    assert(got("自建太陽能").contains("ESGI"))
    assert(got("直購綠電").isEmpty)
  }
}
