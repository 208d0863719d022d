package graft.jobs

import java.time.LocalDate
import java.sql.{Date => SqlDate}
import graft.SparkSpec
import graft.core.FixedClock

/** Fixture tests for the wide raw→staging surface
  * (reference: jobs/raw_to_staging.py:193-919), mirroring the reference's
  * mock-the-seam test pattern but asserting exact output rows. */
class RawToStagingSpec extends SparkSpec {
  import spark.implicits._

  private val clock = FixedClock(LocalDate.of(2026, 8, 1))
  private def d(s: String) = SqlDate.valueOf(s)

  private def base = {
    val bill = Seq(
      ("M1", "契約", "尖峰", 100.0, 2026, 1),
      ("M1", "契約", "尖峰", 50.0, 2026, 2),
      ("M2", "契約", "尖峰", 70.0, 2026, 1), // 表燈營業用電價 meter -> dropped
      ("M3", "計費", "週六", 30.0, 2026, 1) // unmapped meter -> kept, null site
    ).toDF("meter_code", "category1", "category2", "amount", "year", "month")
    val meters = Seq(
      ("S1", "P1", "M1", "ok"),
      ("S2", "P2", "M2", "表燈營業用電價")
    ).toDF("site", "plant", "meter_code", "elec_price_type")
    val providers = Seq(("Prov1", "M1")).toDF("provider_name", "meter_code")
    RawToStaging.greenElectBase(bill, meters, providers, clock)
  }

  test("greenElectBase: tariff filter, category2 decode, YTM, cal_site grains") {
    val contract = RawToStaging.greenElectContract(base)
      .select("site", "plant", "provider_name", "category2", "amount",
        "ytm_amount", "period_start")
      .as[(String, String, String, String, Double, Double, SqlDate)]
      .collect().toSet
    // M1 detail (category2 decoded to 經常尖峰), its rollup (plant ALL) and
    // its site-ALL copy; M2's tariff is filtered out
    assert(contract == Set(
      ("S1", "P1", "Prov1", "經常尖峰", 100.0, 100.0, d("2026-01-01")),
      ("S1", "P1", "Prov1", "經常尖峰", 50.0, 150.0, d("2026-02-01")),
      ("S1", "ALL", "Prov1", "經常尖峰", 100.0, 100.0, d("2026-01-01")),
      ("S1", "ALL", "Prov1", "經常尖峰", 50.0, 150.0, d("2026-02-01")),
      ("ALL", "P1", "Prov1", "經常尖峰", 100.0, 100.0, d("2026-01-01")),
      ("ALL", "P1", "Prov1", "經常尖峰", 50.0, 150.0, d("2026-02-01"))))
  }

  test("greenElectBase: unmapped meters survive the tariff filter but drop from the rollup") {
    val price = RawToStaging.greenElectPrice(base)
      .select("site", "plant", "meter_code", "amount")
      .as[(String, String, String, Double)].collect().toSet
    // M3 has no mapping: null site detail + site-ALL copy, NO plant-ALL
    // rollup row (pandas groupby drops null group keys)
    assert(price == Set(
      (null, null, "M3", 30.0),
      ("ALL", null, "M3", 30.0)))
  }

  test("solar: fillna, YTM per (year, plant, category), site lookup") {
    val raw = Seq(
      ("P1", "gen", Some(10.0), d("2026-01-01")),
      ("P1", "gen", None, d("2026-02-01")), // null amount -> 0
      ("P2", "gen", Some(7.0), d("2026-01-01"))
    ).toDF("plant", "category", "amount", "period_start")
    val mapping = Seq(("S1", "P1")).toDF("site", "plant")
    val got = RawToStaging.solar(raw, mapping, clock)
      .select("site", "plant", "category", "amount", "ytm_amount", "period_start")
      .as[(String, String, String, Double, Double, SqlDate)].collect().toSet
    assert(got == Set(
      ("S1", "P1", "gen", 10.0, 10.0, d("2026-01-01")),
      ("S1", "P1", "gen", 0.0, 10.0, d("2026-02-01")),
      (null, "P2", "gen", 7.0, 7.0, d("2026-01-01"))))
  }

  test("solarRemain: WKS/WZS ratio splits, WMI rename, YTM") {
    val remain = Seq(
      ("WKS/XTRKS", 100.0, d("2026-01-01")),
      ("WZS", 40.0, d("2026-01-01")),
      ("WMI", 10.0, d("2026-01-01")),
      ("WMI", 5.0, d("2026-02-01"))
    ).toDF("site", "amount", "period_start")
    val wksRatio = Seq((0.25, "XTRKS", d("2026-01-01")), (0.75, "WK-1", d("2026-01-01")))
      .toDF("ratio", "plant", "period_start")
    val wzsRatio = Seq((0.5, "WZ-1", d("2026-01-01")), (0.5, "WZ-2", d("2026-01-01")))
      .toDF("ratio", "plant", "period_start")
    val mapping = Seq(("SX", "XTRKS"), ("SK", "WK-1"), ("SZ", "WZ-1"), ("SM", "WMI-2"))
      .toDF("site", "plant")
    val got = RawToStaging.solarRemain(remain, wksRatio, wzsRatio, mapping, clock)
      .select("site", "plant", "amount", "ytm_amount", "period_start")
      .as[(String, String, Double, Double, SqlDate)].collect().toSet
    assert(got == Set(
      ("SX", "XTRKS", 25.0, 25.0, d("2026-01-01")),
      ("SK", "WK-1", 75.0, 75.0, d("2026-01-01")),
      ("SZ", "WZ-1", 20.0, 20.0, d("2026-01-01")),
      (null, "WZ-2", 20.0, 20.0, d("2026-01-01")),
      ("SM", "WMI-2", 10.0, 10.0, d("2026-01-01")),
      ("SM", "WMI-2", 5.0, 15.0, d("2026-02-01"))))
  }

  test("solarOther: area dict, tree/fuel melt, WKS split, unmapped areas drop") {
    val raw = Seq(
      (d("2026-01-01"), "WZS", "TB2", 10.0, 2.0),
      (d("2026-01-01"), "WZS", "TB3", 5.0, 1.0),
      (d("2026-01-01"), "WZS", "ZZZ", 99.0, 99.0), // unmapped area -> dropped
      (d("2026-01-01"), "WMI", null, 4.0, 0.0),
      (d("2026-01-01"), "WKS", null, 8.0, 4.0)
    ).toDF("period_start", "site", "area", "tree", "fuel")
    val wksRatio = Seq((0.5, "XTRKS", d("2026-01-01")), (0.5, "WK-1", d("2026-01-01")))
      .toDF("ratio", "plant", "period_start")
    val mapping = Seq(("SZ", "WZS-1"), ("SM", "WMI-2")).toDF("site", "plant")
    val got = RawToStaging.solarOther(raw, wksRatio, mapping, clock)
      .select("site", "plant", "category", "amount", "ytm_amount")
      .as[(String, String, String, Double, Double)].collect().toSet
    assert(got == Set(
      ("SZ", "WZS-1", "tree", 10.0, 10.0), ("SZ", "WZS-1", "fuel", 2.0, 2.0),
      (null, "WZS-3", "tree", 5.0, 5.0), (null, "WZS-3", "fuel", 1.0, 1.0),
      ("SM", "WMI-2", "tree", 4.0, 4.0), ("SM", "WMI-2", "fuel", 0.0, 0.0),
      (null, "XTRKS", "tree", 4.0, 4.0), (null, "XTRKS", "fuel", 2.0, 2.0),
      (null, "WK-1", "tree", 4.0, 4.0), (null, "WK-1", "fuel", 2.0, 2.0)))
  }

  test("solarInfo: WKS ratio join + re-site by plant, snapshot period for the rest") {
    val raw = Seq(
      ("WKS", "XTRKS", "cap", 100.0),
      ("WKS", "WK-1", "cap", 200.0),
      ("WHC", "WHC", "cap", 50.0),
      ("WZS", "WZ-1", "cap", 30.0)
    ).toDF("site", "plant", "category", "amount")
    val wksRatio = Seq((0.1, "XTRKS", d("2026-07-01")), (0.9, "WK-1", d("2026-07-01")))
      .toDF("ratio", "plant", "period_start")
    val got = RawToStaging.solarInfo(raw, wksRatio, LocalDate.of(2026, 7, 1), clock)
      .select("site", "plant", "category", "amount", "ytm_amount", "period_start")
      .as[(String, String, String, Double, Double, SqlDate)].collect().toSet
    assert(got == Set(
      ("XTRKS", "XTRKS", "cap", 10.0, 10.0, d("2026-07-01")),
      ("WKS", "WK-1", "cap", 180.0, 180.0, d("2026-07-01")),
      ("WHC", "WHC", "cap", 50.0, 50.0, d("2026-07-01")),
      ("WZS", "WZ-1", "cap", 30.0, 30.0, d("2026-07-01"))))
  }

  test("electTotal: latest validated version, ratio splits, target/actual union, YTM") {
    val target = Seq(
      ("S1", 1, 100.0, 2026, "predict", 2, true),
      ("S1", 2, 50.0, 2026, "predict", 2, true),
      ("S1", 1, 90.0, 2026, "actual", 2, true),
      ("WKS", 1, 40.0, 2026, "predict", 2, true),
      ("All", 1, 999.0, 2026, "predict", 2, true), // site filter
      ("S1", 1, 1.0, 2026, "predict", 1, true), // old version
      ("S1", 1, 2.0, 2026, "predict", 3, false) // not validated
    ).toDF("site", "month", "amount", "year", "category", "version", "validate")
    val femRatio = Seq((0.5, "WK-A", d("2026-01-01")), (0.5, "WK-B", d("2026-01-01")))
      .toDF("ratio", "plant", "period_start")
    val wzsRatio = Seq.empty[(Double, String, SqlDate)]
      .toDF("ratio", "plant", "period_start")
    val mapping = Seq(("SS", "S1"), ("SA", "WK-A"), ("SB", "WK-B"))
      .toDF("site", "plant")
    val got = RawToStaging.electTotal(target, femRatio, wzsRatio, mapping, clock)
      .select("site", "plant", "category", "amount", "ytm_amount", "period_start")
      .as[(String, String, String, Double, Double, SqlDate)].collect().toSet
    assert(got == Set(
      ("SS", "S1", "target", 100.0, 100.0, d("2026-01-01")),
      ("SS", "S1", "target", 50.0, 150.0, d("2026-02-01")),
      ("SS", "S1", "actual", 90.0, 90.0, d("2026-01-01")),
      ("SA", "WK-A", "target", 20.0, 20.0, d("2026-01-01")),
      ("SB", "WK-B", "target", 20.0, 20.0, d("2026-01-01"))))
  }

  test("providerPlantList: YTM per (year, area, site, provider)") {
    val rows = Seq(
      ("A1", 2026, 1, "P", "S1", 10.0),
      ("A1", 2026, 2, "P", "S1", 5.0),
      ("A2", 2026, 1, "Q", "S2", 3.0)
    ).toDF("area", "year", "month", "provider", "site", "amount")
    val got = RawToStaging.providerPlantList(rows, clock)
      .select("area", "provider", "site", "amount", "ytm_amount", "period_start")
      .as[(String, String, String, Double, Double, SqlDate)].collect().toSet
    assert(got == Set(
      ("A1", "P", "S1", 10.0, 10.0, d("2026-01-01")),
      ("A1", "P", "S1", 5.0, 15.0, d("2026-02-01")),
      ("A2", "Q", "S2", 3.0, 3.0, d("2026-01-01"))))
  }
}
