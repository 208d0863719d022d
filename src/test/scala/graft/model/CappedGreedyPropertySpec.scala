package graft.model

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.Prop.propBoolean
import graft.SparkSpec
import org.apache.spark.sql.functions._

/** ScalaCheck property: the closed-form capped greedy
  * (RePurposeOptimizer.cappedGreedy) must equal the reference's sequential
  * rank-at-a-time loop (RE_purpose_optimizer.py:196-227) on arbitrary
  * capacity/budget inputs — rank 1 capped at rate·budget, every later rank
  * taking clamp(remaining, 0, cap) in price order. Random inputs exercise
  * exhausted budgets, zero capacities, budgets larger than total capacity,
  * and single-item years. Integer-valued doubles keep both sides exact. */
class CappedGreedyPropertySpec extends SparkSpec {

  /** The reference loop, verbatim semantics, per year. */
  private def sequential(caps: Seq[Double], budget: Double, rate: Double): Seq[Double] = {
    var remaining = math.max(budget, 0.0)
    caps.zipWithIndex.map { case (cap0, i) =>
      val cap = math.max(cap0, 0.0)
      val take =
        if (i == 0) math.min(rate * remaining, cap)
        else math.max(0.0, math.min(cap, remaining))
      remaining -= take
      take
    }
  }

  private val caseGen: Gen[(List[Double], Double)] = for {
    n <- Gen.choose(1, 8)
    caps <- Gen.listOfN(n, Gen.choose(0, 500).map(_.toDouble))
    budget <- Gen.choose(0, 1500).map(_.toDouble)
  } yield (caps, budget)

  test("closed form equals the sequential reference loop (ScalaCheck)") {
    import spark.implicits._
    val prop = Prop.forAll(caseGen) { case (caps, budget) =>
      caps.nonEmpty ==> {
        // price ascending by construction -> rank order == input order
        val items = caps.zipWithIndex
          .map { case (c, i) => (2024, i, i.toDouble, c, budget) }
          .toDF("year", "area", "price", "cap", "budget")
        val got = RePurposeOptimizer.cappedGreedy(items,
            rankOn = col("price"), budget = col("budget"), cap = col("cap"),
            rank1Rate = 0.5, takeCol = "take", tiebreak = Seq(col("area")))
          .select(col("area"), col("take"))
          .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
        val expected = sequential(caps, budget, 0.5).zipWithIndex
          .map { case (t, i) => i -> t }.toMap
        got == expected
      }
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(12), prop)
    assert(res.passed, res.status.toString)
  }

  test("invariants: takes within caps and budget, later ranks never floored up") {
    import spark.implicits._
    val prop = Prop.forAll(caseGen) { case (caps, budget) =>
      caps.nonEmpty ==> {
        val items = caps.zipWithIndex
          .map { case (c, i) => (2024, i, i.toDouble, c, budget) }
          .toDF("year", "area", "price", "cap", "budget")
        val takes = RePurposeOptimizer.cappedGreedy(items,
            rankOn = col("price"), budget = col("budget"), cap = col("cap"),
            rank1Rate = 0.5, takeCol = "take", tiebreak = Seq(col("area")))
          .select(col("area"), col("take"))
          .collect().sortBy(_.getInt(0)).map(_.getDouble(1)).toSeq
        val withinCaps = takes.zip(caps).forall { case (t, c) => t >= 0 && t <= math.max(c, 0) }
        val withinBudget = takes.sum <= math.max(budget, 0.0) + 1e-9
        withinCaps && withinBudget
      }
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(8), prop)
    assert(res.passed, res.status.toString)
  }
}
