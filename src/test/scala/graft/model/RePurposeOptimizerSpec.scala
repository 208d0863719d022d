package graft.model

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Hand-computed fixtures for the full renewable-purchase optimizer
  * (reference: Model/RE_purpose_optimizer.py), covering the rank-1
  * chinese-contract cap, the carbon-adjusted REC ranking, the 1-MWh lot
  * floors (including the reference's unfloored rank-1 tail quirk), the
  * cross-category gate, and the result generator's worldwide rollup. */
class RePurposeOptimizerSpec extends SparkSpec {
  import spark.implicits._

  // ---- 2025 fixture: areas A (sites s1, s2) and B (site s3) ----
  private def aiElect = Seq(
    ("s1", "A", 2025, 1000.0, 100.0),
    ("s2", "A", 2025, 500.0, 80.0),
    ("s3", "B", 2025, 2000.0, 50.0))
    .toDF("site", "area", "year", "amount", "green_full_ratio")
  private def solar = Seq(("s1", "A", 2025, 200.0))
    .toDF("site", "area", "year", "solar_amount")
  private def pricedPpa = Seq(("s1", 2025, 3.0), ("s2", 2025, 5.0))
    .toDF("p_site", "p_year", "price") // s3 unpriced -> max(3,5)+1 = 6
  private def pricedRec = Seq(("s1", 2025, 2.0), ("s2", 2025, 4.0), ("s3", 2025, 1.0))
    .toDF("p_site", "p_year", "price")
  private def contracts = Seq((2025, "A", 100.0))
    .toDF("year", "area", "contract_ytm_amount")
  private def ppaPct = Seq((2025, 40.0)).toDF("year", "amount")
  private def targetPct = Seq((2025, 80.0)).toDF("year", "amount")
  private def coef = Seq((2025, "s1", 0.5), (2025, "s2", 0.7), (2025, "s3", 0.2))
    .toDF("year", "site", "carbon_coeff")

  test("carbonCoef recodes split sites and averages per (year, site)") {
    val raw = Seq((2025, "WIHK1", 0.4), (2025, "WMYP1", 0.6), (2025, "WMYP2", 0.8),
      (2025, "WZS", 0.5), (2024, "WZS", 0.9)) // 2024 dropped (year < now)
      .toDF("year", "site", "amount")
    val got = RePurposeOptimizer.carbonCoef(raw, nowYear = 2025)
      .as[(Int, String, Double)].collect().toSet
    assert(got == Set((2025, "WIHK-1", 0.4), (2025, "WMY", 0.7), (2025, "WZS", 0.5)))
  }

  test("greenStage: rank-1 takes at most half the budget, rank 2 the rest") {
    // site headroom: s1 (1000-200)*1.0 = 800, s2 500*0.8 = 400, s3 2000*0.5
    // = 1000 -> area A max 1200 (price 5), B max 1000 (price 6).
    // budget = clip((1500+2000)*40% - 100 contracts) = 1300.
    // rank 1 = A (cheaper): min(0.5*1300, 1100 remain) = 650;
    // rank 2 = B: clip(1300 - 650) capped at 1000 = 650.
    val got = RePurposeOptimizer.greenStage(aiElect, solar, pricedPpa,
        contracts, ppaPct)
      .as[(String, Int, Double)].collect().map(t => t._1 -> t._3).toMap
    assert(got == Map("A" -> 750.0, "B" -> 650.0)) // contracts 100 + 650; 0 + 650
  }

  test("recStage: carbon-adjusted rank, lot floors, unfloored rank-1 tail") {
    val additions = RePurposeOptimizer.greenStage(aiElect, solar, pricedPpa,
      contracts, ppaPct)
    // budget = clip(3500*80% - 200 solar - 1400 additions) = 1200.
    // s3 has no PPA price, so no B-PPA row exists (the reference's left
    // join to the union'd price table behaves identically — the max+1
    // price fill only fires for sites matching NO category at all).
    // carbon-adjusted prices: B-REC 0.8 < A-REC 3.4 < A-PPA 4.4.
    // rank 1 B-REC (remain cap 2000-0-650=1350): 1200 - lot(1350)=200 < 1000
    //   -> takes the UNfloored 1200 (ref :285 branch 2); budget exhausted.
    val got = RePurposeOptimizer.recStage(aiElect, solar, pricedPpa, pricedRec,
        coef, additions, targetPct)
      .select(col("area"), col("category"),
        col("rec_green_contract_addition_ytm_amount"))
      .as[(String, String, Double)].collect().toSet
    assert(got == Set(
      ("B", "REC", 1200.0), ("A", "REC", 0.0),
      ("A", "PPA", 750.0))) // PPA row adds the stage-1 result
  }

  test("recStage floored branches: full lots then the floored remainder") {
    // single-area-per-category capacities 7000, budget 12000:
    // rank1 A-PPA takes lot(7000)=7000 (branch 3), rank2 B-PPA takes
    // lot(12000-7000)=5000 (floored remainder, branch 2), RECs get 0 —
    // A-REC gated by its PPA row having consumed the area capacity AND by
    // remain < 1000.
    val ai = Seq(("s1", "A", 2026, 10000.0, 100.0), ("s3", "B", 2026, 10000.0, 100.0))
      .toDF("site", "area", "year", "amount", "green_full_ratio")
    val noSolar = Seq.empty[(String, String, Int, Double)]
      .toDF("site", "area", "year", "solar_amount")
    val ppaP = Seq(("s1", 2026, 3.0), ("s3", 2026, 4.0)).toDF("p_site", "p_year", "price")
    val recP = Seq(("s1", 2026, 10.0), ("s3", 2026, 12.0)).toDF("p_site", "p_year", "price")
    val noContracts = Seq.empty[(Int, String, Double)]
      .toDF("year", "area", "contract_ytm_amount")
    val cf = Seq((2026, "s1", 0.0), (2026, "s3", 0.0)).toDF("year", "site", "carbon_coeff")
    val additions = RePurposeOptimizer.greenStage(ai, noSolar, ppaP, noContracts,
      Seq((2026, 30.0)).toDF("year", "amount")) // budget 6000 -> 3000 + 3000
    val got = RePurposeOptimizer.recStage(ai, noSolar, ppaP, recP, cf, additions,
        Seq((2026, 90.0)).toDF("year", "amount"))
      .select(col("area"), col("category"),
        col("rec_green_contract_addition_ytm_amount"))
      .as[(String, String, Double)].collect().toSet
    assert(got == Set(
      ("A", "PPA", 10000.0), // 7000 + stage-1 3000
      ("B", "PPA", 8000.0),  // 5000 + 3000
      ("A", "REC", 0.0), ("B", "REC", 0.0)))
  }

  test("results: category recode, cost scaling, worldwide rollup, rate rounding") {
    val additions = RePurposeOptimizer.greenStage(aiElect, solar, pricedPpa,
      contracts, ppaPct)
    val rec = RePurposeOptimizer.recStage(aiElect, solar, pricedPpa, pricedRec,
      coef, additions, targetPct)
    val stamp = java.sql.Timestamp.valueOf("2025-06-01 00:00:00")
    val (rate, amount, cost) = RePurposeOptimizer.results(rec, stamp)

    val amounts = amount.as[(String, String, Double, Int, java.sql.Timestamp)]
      .collect().map(t => (t._1, t._2) -> t._3).toMap
    assert(amounts(("A", "solar")) == 200.0 && amounts(("B", "solar")) == 0.0)
    assert(amounts(("A", "green_elect")) == 750.0) // no B-PPA row exists (see above)
    assert(amounts(("B", "green_energy")) == 1200.0)
    assert(amounts(("全集團", "green_elect")) == 750.0) // worldwide rollup
    assert(amounts(("全集團", "solar")) == 200.0)

    val costs = cost.as[(String, String, Double, Int, java.sql.Timestamp)]
      .collect().map(t => (t._1, t._2) -> t._3).toMap
    assert(costs(("A", "green_elect")) == 750.0 * 5.0 / 1000) // price/1000 scaling
    assert(costs(("B", "green_energy")) == 1200.0 * 1.0 / 1000)
    assert(costs(("A", "solar")) == 0.0)

    val rates = rate.as[(String, String, Double, Int, java.sql.Timestamp)]
      .collect().map(t => (t._1, t._2) -> t._3).toMap
    assert(rates(("A", "solar")) == 13.3)            // round(200/1500*100, 1)
    assert(rates(("全集團", "green_elect")) == 21.4)  // round(750/3500*100, 1)
    // every output row carries the injected stamp (no wall-clock reads)
    assert(rate.select("last_update_time").distinct().collect()
      .map(_.getTimestamp(0)).toSeq == Seq(stamp))
  }

  test("null carbon coeff never allocates; unpriced sites vanish like pandas") {
    // s2 (area B) has a REC price but NO carbon-coef row (and is not WVN):
    // its adjusted price is null -> pandas rank gives NaN -> the reference
    // loop never matches it. s3 (area C) matches NO price row at all: its
    // null category drops at the rollup (pandas groupby drops null keys),
    // so it neither consumes budget nor appears in the output.
    val ai = Seq(("s1", "A", 2027, 10000.0, 100.0), ("s2", "B", 2027, 10000.0, 100.0),
      ("s3", "C", 2027, 99999.0, 100.0))
      .toDF("site", "area", "year", "amount", "green_full_ratio")
    val noSolar = Seq.empty[(String, String, Int, Double)]
      .toDF("site", "area", "year", "solar_amount")
    val ppaP = Seq(("s1", 2027, 3.0)).toDF("p_site", "p_year", "price")
    val recP = Seq(("s1", 2027, 5.0), ("s2", 2027, 1.0)).toDF("p_site", "p_year", "price")
    val cf = Seq((2027, "s1", 0.5)).toDF("year", "site", "carbon_coeff")
    val noContracts = Seq.empty[(Int, String, Double)]
      .toDF("year", "area", "contract_ytm_amount")
    val additions = RePurposeOptimizer.greenStage(ai, noSolar, ppaP, noContracts,
      Seq((2027, 0.0)).toDF("year", "amount")) // zero PPA budget
    val got = RePurposeOptimizer.recStage(ai, noSolar, ppaP, recP, cf, additions,
        Seq((2027, 50.0)).toDF("year", "amount")) // budget = 20000*50% = 10000
      .select(col("area"), col("category"),
        col("rec_green_contract_addition_ytm_amount"))
      .as[(String, String, Double)].collect().toSet
    // B-REC is the cheapest raw price (1) but unranked -> rank 1 is A-PPA
    // (stand 2.5), which takes the whole budget via the unfloored tail
    assert(got == Set(
      ("A", "PPA", 10000.0), ("A", "REC", 0.0), ("B", "REC", 0.0)))
  }

  test("stage-1 closed form equals the naive sequential rank loop") {
    // independent witness: replay the reference's rank-at-a-time loop in
    // plain Scala over the same area table and compare every allocation
    val area = RePurposeOptimizer.greenStage(aiElect, solar, pricedPpa,
      contracts, ppaPct) // engine result: contracts + additions
    // scalar replay (budget 1300, rank-1 cap 0.5): caps in price order
    val caps = Seq(("A", 1100.0), ("B", 1000.0)) // remain after contracts
    var budget = 1300.0
    var takes = Map.empty[String, Double]
    caps.zipWithIndex.foreach { case ((a, cap), i) =>
      val t = if (i == 0) math.min(0.5 * budget, cap)
              else math.max(0.0, math.min(cap, budget))
      takes += a -> t; budget -= t
    }
    val expected = Map("A" -> (100.0 + takes("A")), "B" -> (0.0 + takes("B")))
    val got = area.as[(String, Int, Double)].collect()
      .map(t => t._1 -> t._3).toMap
    assert(got == expected)
  }
}
