package graft.operators

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.Prop.propBoolean
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** ScalaCheck property: for ARBITRARY fact sets, ARBITRARY slicings into
  * deltas, and ARBITRARY merge orders, the maintained state must finalize
  * identically to the from-scratch batch build. This is the contract that
  * lets a 100 TB warehouse trust delta-sized refreshes: no slicing of
  * history can drift from the rescan answer. Random amounts include
  * negatives and repeated keys; random slice boundaries include empty and
  * singleton slices. */
class IncrementalPropertySpec extends SparkSpec {
  import spark.implicits._

  private val group = Seq("k")

  private val factsGen: Gen[List[(String, Double)]] =
    Gen.listOfN(30, for {
      k <- Gen.oneOf("a", "b", "c", "d")
      // two-decimal amounts, both signs — the Money.cents domain
      cents <- Gen.choose(-500000L, 500000L)
    } yield (k, cents / 100.0))

  private val sliceGen: Gen[(List[(String, Double)], List[Int])] = for {
    facts <- factsGen
    nCuts <- Gen.choose(0, 4)
    cuts <- Gen.listOfN(nCuts, Gen.choose(0, facts.size))
  } yield (facts, cuts)

  test("any slicing + any merge order finalizes equal to the batch build (ScalaCheck)") {
    val prop = Prop.forAll(sliceGen) { case (facts, cuts) =>
      facts.nonEmpty ==> {
        val df = facts.toDF("k", "amount")
        val batch = Incremental.finalize(
          Incremental.partials(df, group, col("amount")))
          .collect().map(_.toString).sorted.toSeq

        val bounds = (0 +: cuts.sorted :+ facts.size).distinct
        val slices = bounds.zip(bounds.tail).map { case (a, b) =>
          facts.slice(a, b)
        }.filter(_.nonEmpty).map(_.toDF("k", "amount"))
        val partials = slices.map(Incremental.partials(_, group, col("amount")))
        // fold in REVERSE arrival order to also exercise commutativity
        val merged = partials.reverse.reduce((a, b) =>
          Incremental.merge(group, a, b))
        val inc = Incremental.finalize(merged)
          .collect().map(_.toString).sorted.toSeq
        inc == batch
      }
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(res.passed, res.status.toString)
  }
}
