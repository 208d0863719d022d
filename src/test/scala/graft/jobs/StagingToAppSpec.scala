package graft.jobs

import java.sql.{Date => SqlDate, Timestamp}
import graft.SparkSpec

class StagingToAppSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s + " 00:00:00")
  private def d(s: String) = SqlDate.valueOf(s)

  test("applicableTariff: latest past rule, or earliest when a future rule exists") {
    val now = ts("2026-06-01")
    val rules = Seq(
      // area A: all in the past -> latest (2026-01-01)
      ("A", 1L, ts("2025-01-01")), ("A", 2L, ts("2026-01-01")),
      // area B: one future rule -> earliest overall (2024-01-01)
      ("B", 3L, ts("2024-01-01")), ("B", 4L, ts("2027-01-01"))
    ).toDF("area", "base_id", "guideline_date")
    val got = StagingToApp.applicableTariff(rules, now)
      .select("area", "base_id").as[(String, Long)].collect().toMap
    assert(got == Map("A" -> 2L, "B" -> 3L))
  }

  test("seasonalSplit keeps summer prices inside the window, non-summer outside") {
    val priced = Seq(
      (d("2026-07-01"), d("2026-06-01"), d("2026-09-30"), true, 1.5), // summer in window: keep
      (d("2026-07-01"), d("2026-06-01"), d("2026-09-30"), false, 1.0), // non-summer in window: drop
      (d("2026-02-01"), d("2026-06-01"), d("2026-09-30"), true, 1.5), // summer out of window: drop
      (d("2026-02-01"), d("2026-06-01"), d("2026-09-30"), false, 1.0) // non-summer outside: keep
    ).toDF("period_start", "start_date", "end_date", "is_summer", "price")
    val got = StagingToApp.seasonalSplit(priced)
      .select("period_start", "price").as[(SqlDate, Double)].collect().toSet
    assert(got == Set((d("2026-07-01"), 1.5), (d("2026-02-01"), 1.0)))
  }

  private val clock = graft.core.FixedClock(java.time.LocalDate.of(2026, 8, 1))
  private val jul = java.time.LocalDate.of(2026, 7, 1)

  private def volSchema = Seq("site", "plant", "meter_code", "provider_name",
    "category1", "category2", "amount", "period_start")

  test("greenElecTransferAccount: nine families, tariff pricing, group rates") {
    val vol = Seq(
      ("WLT", "ALL", "M1", "GreenCo", "轉供", "總綠電度數", 30.0, d("2026-07-01")),
      ("WLT", "P1", "M1", "GreenCo", "轉供", "離峰", 20.0, d("2026-07-01"))
    ).toDF(volSchema: _*)
    val price = Seq(
      ("WLT", "P1", "M1", "GreenCo", "計費", "離峰", 40.0, d("2026-07-01")),
      ("WLT", "P1", "M1", "GreenCo", "計費", "經常尖峰", 10.0, d("2026-07-01"))
    ).toDF(volSchema: _*)
    val meterMapping = Seq(("M1", "typeA")).toDF("meter_code", "elect_type")
    val billMeter = Seq(
      ("夏日平日離峰", 2.0, "typeA", true, 1L),
      ("非夏日平日離峰", 1.0, "typeA", false, 1L),
      ("夏日平日尖峰", 3.0, "typeA", true, 1L)
    ).toDF("category2", "price", "elect_type", "is_summer", "base_id")
    val billBase = Seq((1L, "north", ts("2026-01-01")))
      .toDF("base_id", "area", "guideline_date")
    val billSummer = Seq(("typeA", d("2026-06-01"), d("2026-09-30"), 1L))
      .toDF("elect_type", "start_date", "end_date", "base_id")
    val contract = Seq(("GreenCo", 5.0)).toDF("provider_name", "contract_price")
    val areaMap = Seq(("north2", "M1")).toDF("area", "meter_code")
    val meterGroup = Seq(("M1", 1)).toDF("meter_code", "group_id")
    val groupNames = Seq((1, "Bundle1")).toDF("group_id", "group_name")

    val got = StagingToApp.greenElecTransferAccount(vol, price, meterMapping,
      billMeter, billBase, billSummer, contract, areaMap, meterGroup,
      groupNames, jul, ts("2026-08-01"), clock)

    assert(got.count() == 28) // 16 account + 10 grouped + 2 group rates

    def amounts(c1: String, c2: String, meter: String) =
      got.filter($"category1" === c1 && $"category2" === c2 &&
        $"meter_code" === meter)
        .select("plant", "amount").as[(String, Double)].collect().toMap

    // seasonal split picked the summer tariff (period July in window)
    assert(amounts("grey_elect_price", "off_peak", "M1") == Map("P1" -> 2.0))
    assert(amounts("grey_elect_price", "peak", "M1") == Map("P1" -> 3.0))
    // grey bill: 40*2 + 10*3
    assert(amounts("grey_elect", "elect_bill", "M1") == Map("P1" -> 110.0))
    // green bill: contract-priced transfers
    assert(amounts("green_elect_vol", "elect_bill", "M1") ==
      Map("ALL" -> 150.0, "P1" -> 100.0))
    // per-category green rate 20/40; total rate 20/50 (ALL has no grey match)
    val rates = got.filter($"category1" === "green_rate" && $"meter_code" === "M1")
      .select("category2", "plant", "amount")
      .as[(String, String, Option[Double])].collect().toSet
    assert(rates == Set(
      ("off_peak", "P1", Some(0.5)), ("elect_total", "P1", Some(0.4)),
      ("總綠電度數", "ALL", None), ("elect_total", "ALL", None)))
    // packaged-meter rollup carries the bundle name as meter_code
    assert(amounts("grey_elect", "elect_total", "Bundle1") == Map("P1" -> 50.0))
    val groupRates = got.filter($"category1" === "green_rate" &&
      $"meter_code" === "Bundle1")
      .select("category2", "amount").as[(String, Double)].collect().toMap
    assert(groupRates == Map("off_peak" -> 0.5, "elect_total" -> 0.4))
    assert(got.filter($"area" =!= "north2").count() == 0)
  }

  test("greenElecTransferAccount: WHC_ALL green rate on the recoded category") {
    val vol = Seq(
      ("WHC", "WHC", "WHC_ALL", "富威", "轉供", "總綠電度數", 30.0, d("2026-07-01"))
    ).toDF(volSchema: _*)
    val price = Seq(
      ("WHC", "WHC", "WHC_ALL", "富威", "計費", "離峰", 40.0, d("2026-07-01"))
    ).toDF(volSchema: _*)
    val meterMapping = Seq(("WHC_ALL", "typeA")).toDF("meter_code", "elect_type")
    val billMeter = Seq(("夏日平日離峰", 2.0, "typeA", true, 1L))
      .toDF("category2", "price", "elect_type", "is_summer", "base_id")
    val billBase = Seq((1L, "north", ts("2026-01-01")))
      .toDF("base_id", "area", "guideline_date")
    val billSummer = Seq(("typeA", d("2026-06-01"), d("2026-09-30"), 1L))
      .toDF("elect_type", "start_date", "end_date", "base_id")
    val contract = Seq(("富威", 5.0)).toDF("provider_name", "contract_price")
    val areaMap = Seq(("north2", "WHC_ALL")).toDF("area", "meter_code")
    val meterGroup = Seq.empty[(String, Int)].toDF("meter_code", "group_id")
    val groupNames = Seq.empty[(Int, String)].toDF("group_id", "group_name")

    val got = StagingToApp.greenElecTransferAccount(vol, price, meterMapping,
      billMeter, billBase, billSummer, contract, areaMap, meterGroup,
      groupNames, jul, ts("2026-08-01"), clock)

    // area forced to 台灣 and 總綠電度數 recoded, so the green/grey
    // elect_total sides join: 30/40
    val rate = got.filter($"category1" === "green_rate" &&
      $"category2" === "elect_total" && $"amount".isNotNull)
      .select("amount", "area").as[(Double, String)].collect().toSet
    assert(rate.contains((0.75, "台灣")))
    // the per-category green rate (unjoinable 總綠電度數 vs 離峰) was
    // dropped in favor of the recoded one
    assert(got.filter($"category1" === "green_rate" && $"amount".isNull)
      .count() == 0)
  }

  test("solarEnergyOverview: actual=use+remain, ratios, WZKS site rollup, plant filter") {
    def stg(rows: (String, String, String, Double, Double)*) =
      rows.map { case (s, p, c, a, y) => (s, p, c, a, y, d("2026-07-01")) }
        .toDF("site", "plant", "category", "amount", "ytm_amount", "period_start")
    val solar = stg(("S1", "P1", "actual", 10, 10), ("S1", "P1", "target", 20, 20),
      ("WZS", "WZ-1", "actual", 30, 30), ("WZS", "WZ-1", "target", 40, 40))
    val remain = Seq(("S1", "P1", 5.0, 5.0, d("2026-07-01")))
      .toDF("site", "plant", "amount", "ytm_amount", "period_start")
    val info = stg(("S1", "P1", "cap", 7, 7))
    val other = stg(("S1", "P1", "tree", 1, 1))
    val elect = stg(("S1", "P1", "actual", 100, 100), ("S1", "P1", "target", 200, 200),
      ("WZS", "WZ-1", "actual", 300, 300), ("WZS", "WZ-1", "target", 400, 400))

    val got = StagingToApp.solarEnergyOverview(solar, remain, info, other,
        elect, clock)
      .select("site", "plant", "category", "amount")
      .as[(String, String, String, Double)].collect().toSet
    assert(got == Set(
      ("S1", "P1", "actual", 15.0), ("WZS", "WZ-1", "actual", 30.0),
      ("S1", "P1", "target", 20.0), ("WZS", "WZ-1", "target", 40.0),
      ("S1", "P1", "remain", 5.0),
      ("S1", "P1", "actual_use", 10.0), ("WZS", "WZ-1", "actual_use", 30.0),
      ("S1", "P1", "cap", 7.0), ("S1", "P1", "tree", 1.0),
      ("S1", "P1", "elect_total_actual", 100.0),
      ("S1", "P1", "elect_total_target", 200.0),
      ("S1", "P1", "solar_ratio_actual", 15.0),
      ("S1", "P1", "solar_ratio_target", 10.0)))
    // plant='ALL' WZKS rollup rows were filtered out by the plant list —
    // exactly the reference's plant_list isin filter
  }

  test("greenElectOverview: outer joins, double actual_ytm filter, unit ratios") {
    val providerTarget = Seq(("S1", 10.0, 70.0, d("2026-07-01")))
      .toDF("site", "amount", "ytm_amount", "period_start")
    val electTarget = Seq(
      ("S1", 100.0, 700.0, d("2026-07-01")),
      ("WZS", 50.0, 350.0, d("2026-07-01")),
      ("WZS", 30.0, 210.0, d("2026-07-01"))
    ).toDF("site", "amount", "ytm_amount", "period_start")
    val electActual = Seq(("S1", 90.0, 630.0, d("2026-07-01")))
      .toDF("site", "amount", "ytm_amount", "period_start")
    val greenVol = Seq(
      ("S1", 8.0, 56.0, d("2026-07-01")),
      ("S2", 5.0, 0.0, d("2026-07-01")) // zero YTM -> dropped
    ).toDF("site", "amount", "ytm_amount", "period_start")
    val yearTarget = Seq(("S1", "ProvA", 6.0), ("S1", "ProvA", 6.0))
      .toDF("site", "provider", "amount")
    val yearTargetAll = Seq(("S1", 500.0), ("WZS", 300.0)).toDF("site", "amount")
    val greenPrice = Seq(("S1", 2.0), ("WIHK-1", 3.0)).toDF("site", "amount")
    val coef = Seq(("S1", 0.5)).toDF("site", "amount")
    val areaMap = Seq(("S1", "TW-N"), ("WZS", "TW-S")).toDF("site", "area")

    val got = StagingToApp.greenElectOverview(providerTarget, electTarget,
      electActual, greenVol, yearTarget, yearTargetAll, greenPrice, coef,
      areaMap, jul, clock)
    val rows = got.collect()
    assert(rows.length == 1) // WZS: actual_ytm 0 after fill; S2: zero YTM
    val r = rows.head
    def f(c: String): Double = r.getAs[Double](c)
    assert(r.getAs[String]("site") == "S1" && r.getAs[Int]("year") == 2026 &&
      r.getAs[Int]("month") == 7)
    assert(f("target") == 10.0 && f("target_ytm") == 70.0)
    assert(f("target_all") == 180.0 && f("target_ytm_all") == 1260.0)
    assert(f("actual_all") == 90.0 && f("actual_ytm_all") == 630.0)
    assert(f("actual") == 8.0 && f("actual_ytm") == 56.0)
    assert(f("year_target") == 12.0 && f("year_target_all") == 800.0)
    assert(f("price_diff") == 2.0 && approx(f("unit"), 0.25) &&
      approx(f("unit_ytm"), 0.25))
    assert(r.getAs[String]("area") == "TW-N" &&
      r.getAs[String]("provider") == "ProvA")
  }

  test("last12MonthsSlice keeps exactly the rolling window") {
    val df = (1 to 14).map(i => (i, d(f"2025-${((i - 1) % 12) + 1}%02d-01")))
      .toDF("i", "period_start")
    // clock 2026-08-01 -> window 2025-08-01 .. 2026-07-31
    val kept = StagingToApp.last12MonthsSlice(df, clock)
      .select("period_start").as[SqlDate].collect().toSet
    assert(kept == (8 to 12).map(m => d(f"2025-$m%02d-01")).toSet)
  }

  test("femRatio computes each plant's share of its site total") {
    val daily = Seq(
      ("P1", d("2026-01-03"), 30.0), ("P1", d("2026-01-04"), 30.0),
      ("P2", d("2026-01-03"), 40.0), ("PX", d("2026-01-03"), 99.0) // unmapped: dropped
    ).toDF("plant_code", "datadate", "power")
    val mapping = Seq(("WKS", "Plant1", "P1"), ("WKS", "Plant2", "P2"))
      .toDF("site", "plant", "plant_code")
    val got = SourceToRaw.femRatio(daily, mapping, d("2026-01-01"))
      .select("plant", "amount", "ratio").as[(String, Double, Double)]
      .collect().map { case (p, a, r) => p -> ((a, r)) }.toMap
    assert(got("Plant1") == ((60.0, 0.6)))
    assert(got("Plant2") == ((40.0, 0.4)))
  }
}
