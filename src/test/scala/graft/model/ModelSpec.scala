package graft.model

import graft.SparkSpec
import FactoryElectSimulator._

class ModelSpec extends SparkSpec {
  import spark.implicits._

  test("greedy allocation: closed form equals the reference's rank loop") {
    val items = Seq(
      // year, area, price, capacity
      (2026, "A", 10.0, 500.0), (2026, "B", 20.0, 400.0), (2026, "C", 30.0, 400.0),
      (2027, "A", 5.0, 100.0), (2027, "B", 6.0, 50.0)
    ).toDF("yr", "area", "price", "cap")
    val budgets = Seq((2026, 1000.0), (2027, 800.0)).toDF("yr", "budget")
    val got = GreedyAllocator.allocate(items, budgets, "yr", "price", "cap",
        "budget", Seq("area"))
      .select("yr", "area", "price_rank", "allocated")
      .as[(Int, String, Int, Double)].collect().toSet
    // 2026: A(500) then B(400) then C gets the 100 left; 2027: under-budget
    assert(got == Set(
      (2026, "A", 1, 500.0), (2026, "B", 2, 400.0), (2026, "C", 3, 100.0),
      (2027, "A", 1, 100.0), (2027, "B", 2, 50.0)))
  }

  test("greedy allocation with 1-MWh lots floors capacities and budget") {
    val items = Seq((2026, "A", 1.0, 2500.0), (2026, "B", 2.0, 1999.0))
      .toDF("yr", "area", "price", "cap")
    val budgets = Seq((2026, 3500.0)).toDF("yr", "budget")
    val got = GreedyAllocator.allocate(items, budgets, "yr", "price", "cap",
        "budget", Seq("area"), lotSize = Some(1000.0))
      .select("area", "allocated").as[(String, Double)].collect().toMap
    // caps floor to 2000/1000, budget floors to 3000: A=2000, B=1000
    assert(got == Map("A" -> 2000.0, "B" -> 1000.0))
  }

  test("simulate compounds each plant's CAGR from its latest year") {
    val hist = Seq(("P1", 2023, 100.0), ("P1", 2024, 110.0), ("P1", 2025, 121.0))
      .toDF("plant", "year", "amount")
    val rates = trendRates(hist)
    val r = rates.as[(String, Double)].head()
    assert(approx(r._2, 0.10, 1e-9))
    val sim = simulate(hist, rates, 2027)
      .as[(String, Int, Double)].collect().map(t => t._2 -> t._3).toMap
    assert(approx(sim(2026), 121.0 * 1.1, 1e-9))
    assert(approx(sim(2027), 121.0 * 1.21, 1e-9))
  }

  test("scoreBatches calls the scorer once per plant with the full batch") {
    // closures are serialized even in local mode, so capture counts in a
    // JVM-static holder the executor threads share with the test
    ModelSpec.calls.clear()
    val scorer = new Scorer {
      override def scorePlant(plant: String, rows: Seq[FeatureRow]): Seq[ScoredRow] = {
        ModelSpec.calls.merge(plant, 1, (a, b) => a + b)
        rows.map(r => ScoredRow(r.plant, r.year, r.features.values.sum * 2))
      }
    }
    val feats = Seq(
      FeatureRow("P1", 2026, Map("shipment" -> 3.0)),
      FeatureRow("P1", 2027, Map("shipment" -> 4.0)),
      FeatureRow("P2", 2026, Map("shipment" -> 5.0))).toDS()
    val got = scoreBatches(feats, scorer).collect()
      .map(r => (r.plant, r.year) -> r.prediction).toMap
    assert(got == Map(("P1", 2026) -> 6.0, ("P1", 2027) -> 8.0, ("P2", 2026) -> 10.0))
    assert(ModelSpec.calls.get("P1") == 1 && ModelSpec.calls.get("P2") == 1)
  }

  test("featurePrep classifies MOH accounts and pivots wide") {
    val raw = Seq(
      ("PC1", "Direct Headcount", d("2026-01-01"), 10.0),
      ("PC1", "Indirect Headcount", d("2026-01-01"), 5.0),
      ("PC1", "Production Qty", d("2026-01-01"), 100.0),
      ("PC1", "Shipments", d("2026-01-01"), 50.0),
      ("PCX", "Direct Headcount", d("2026-01-01"), 99.0) // unmapped: dropped
    ).toDF("plant_code", "accountnm", "date_key", "value")
    val mapping = Seq(("PC1", "BO1", "S1", "WCD-1"))
      .toDF("plant_code", "bo", "site", "plant_name")
    val got = featurePrep(raw, mapping).collect()
    assert(got.length == 1)
    val r = got.head
    assert(r.getAs[String]("plant_name") == "WCD") // WCD-1 folded
    assert(r.getAs[Double]("member_counts") == 15.0 &&
      r.getAs[Double]("product_qty") == 100.0 &&
      r.getAs[Double]("shipment_qty") == 50.0)
  }

  test("imputeNegativeRates replaces negatives with the 25th positive percentile") {
    val rates = Seq(("P1", 0.5), ("P2", 0.1), ("P3", -0.2), ("P4", 0.3))
      .toDF("plant", "rate")
    val got = imputeNegativeRates(rates).as[(String, Double)].collect().toMap
    // positives sorted [0.1, 0.3, 0.5]: np.quantile(..., 0.25) = 0.2
    assert(approx(got("P3"), 0.2))
    assert(got("P1") == 0.5 && got("P2") == 0.1 && got("P4") == 0.3)
  }

  test("copyForwardRepair re-dates the previous month over the broken one") {
    val df = Seq(
      ("WOK", d("2026-11-01"), 10.0), ("WOK", d("2026-12-01"), -99.0),
      ("OTHER", d("2026-12-01"), 7.0)
    ).toDF("plant", "datetime", "v")
    val got = copyForwardRepair(df, "WOK", d("2026-11-01"), d("2026-12-01"))
      .as[(String, java.sql.Date, Double)].collect().toSet
    assert(got == Set(
      ("WOK", d("2026-11-01"), 10.0), ("WOK", d("2026-12-01"), 10.0),
      ("OTHER", d("2026-12-01"), 7.0)))
  }

  test("backfillColumn prefers corrected values where present") {
    val df = Seq(("P1", 1, 10.0), ("P1", 2, 20.0)).toDF("plant", "m", "v")
    val fix = Seq(("P1", 2, 99.0)).toDF("plant", "m", "v")
    val got = backfillColumn(df, fix, Seq("plant", "m"), "v")
      .as[(String, Int, Double)].collect().map { case (_, m, v) => (m, v) }.toMap
    assert(got == Map(1 -> 10.0, 2 -> 99.0))
  }

  test("monthGrowthVsBase joins same-calendar-month base predictions") {
    val preds = Seq(
      ("WZS-8", 2026, 1, d("2026-01-01"), 100.0),
      ("WZS-8", 2027, 1, d("2027-01-01"), 120.0),
      ("WIHK-1", 2026, 1, d("2026-01-01"), 50.0),
      ("WIHK-1", 2027, 1, d("2027-01-01"), 40.0)
    ).toDF("plant", "year", "month", "datetime", "predict_electricity")
    val got = monthGrowthVsBase(preds, 2026, d("2026-01-01"), d("2026-12-01"))
      .filter($"year" === 2027)
      .select("plant", "site", "month_grouth_rate")
      .as[(String, String, Double)].collect().toSet
    // WZS-8 -> site WZS; WIHK-1 keeps its full plant id
    assert(got.map(t => (t._1, t._2)) ==
      Set(("WZS-8", "WZS"), ("WIHK-1", "WIHK-1")))
    val rates = got.map(t => t._1 -> t._3).toMap
    assert(approx(rates("WZS-8"), 0.2) && approx(rates("WIHK-1"), -0.2))
  }

  test("growth-rate clamps match the reference's parameter rules") {
    val df = Seq(1500.0, 0.999, -1.5, 0.4).toDF("gr")
      .withColumn("reset", resetOutlierGrowthRate($"gr"))
      .withColumn("clamped", clampGrowthRate($"gr"))
    val rows = df.select("gr", "reset", "clamped")
      .as[(Double, Double, Double)].collect().toMap2
    assert(rows(1500.0) == ((0.5, 0.7))) // reset to 0.5; raw 1500 >= 0.99 -> 0.7
    assert(rows(0.999) == ((0.999, 0.7)))
    assert(rows(-1.5) == ((-1.5, -1.0)))
    assert(rows(0.4) == ((0.4, 0.2)))
  }

  private def d(s: String) = java.sql.Date.valueOf(s)

  implicit class Tuple3Ops(rows: Array[(Double, Double, Double)]) {
    def toMap2: Map[Double, (Double, Double)] =
      rows.map(t => t._1 -> ((t._2, t._3))).toMap
  }

  test("disaggregateBySite splits plant totals by weight share") {
    val totals = Seq(("P1", 2026, 100.0)).toDF("plant", "year", "amount")
    val weights = Seq(("P1", "S1", 3.0), ("P1", "S2", 1.0)).toDF("plant", "site", "weight")
    val got = disaggregateBySite(totals, weights)
      .select("site", "amount").as[(String, Double)].collect().toMap
    assert(got == Map("S1" -> 75.0, "S2" -> 25.0))
  }
}

object ModelSpec {
  val calls = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
}
