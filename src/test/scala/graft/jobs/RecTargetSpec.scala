package graft.jobs

import java.sql.{Date => SqlDate}
import graft.SparkSpec

class RecTargetSpec extends SparkSpec {
  import spark.implicits._

  private def d(s: String) = SqlDate.valueOf(s)
  private def cur(month: Int, amount: Double, ytm: Double) =
    Seq((d(f"2026-$month%02d-01"), amount, ytm))
      .toDF("period_start", "amount", "ytm_amount")
  private val prior = Seq((3, 90.0, 90.0), (6, 30.0, 120.0), (9, 40.0, 160.0))
    .toDF("month", "amount", "ytm_amount")

  private def run(month: Int, amount: Double, ytm: Double) =
    RecTarget.quarterlyRecTarget(cur(month, amount, ytm), month, prior)
      .select("amount", "ytm_amount").as[(Double, Double)].head()

  test("quarter months settle the YTM delta; in-between months carry the quarter") {
    assert(run(3, 30.0, 90.0) == ((90.0, 90.0))) // Q1: amount := ytm
    assert(run(4, 10.0, 100.0) == ((0.0, 90.0))) // carry March ytm
    assert(run(6, 10.0, 120.0) == ((30.0, 120.0))) // ytm - March amount
    assert(run(8, 10.0, 150.0) == ((0.0, 120.0))) // carry June ytm
    assert(run(9, 10.0, 160.0) == ((40.0, 160.0))) // ytm - (Mar+Jun)
    assert(run(11, 10.0, 170.0) == ((0.0, 160.0))) // carry Sep ytm
    assert(run(12, 10.0, 200.0) == ((40.0, 200.0))) // ytm - (Mar+Jun+Sep)
    assert(run(1, 10.0, 10.0) == ((0.0, 0.0))) // new year: zeroed
  }
}
