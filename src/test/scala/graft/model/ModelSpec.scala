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
