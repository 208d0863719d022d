package graft.functions

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.Prop.propBoolean
import graft.SparkSpec
import org.apache.spark.sql.Encoders

/** The Misra-Gries guarantees are ORDER-INDEPENDENT even though the
  * summary's exact set is not: every item with true count > n/(k+1) must be
  * present, and no reported lower bound may undercount by more than
  * n/(k+1). Property-checked on skewed random corpora across randomized
  * partition counts (= randomized merge trees). */
class HeavyHittersSpec extends SparkSpec {

  private val corpusGen: Gen[(List[String], Int, Int)] = for {
    n <- Gen.choose(50, 300)
    items <- Gen.listOfN(n, Gen.frequency(
      (8, Gen.const("heavy")), (3, Gen.const("mid")),
      (5, Gen.oneOf("a", "b", "c", "d", "e", "f", "g", "h"))))
    k <- Gen.choose(2, 6)
    parts <- Gen.choose(1, 7)
  } yield (items, k, parts)

  test("MG guarantees hold under randomized partitionings (ScalaCheck)") {
    val prop = Prop.forAll(corpusGen) { case (items, k, parts) =>
      items.nonEmpty ==> {
        val ds = spark.createDataset(items)(Encoders.STRING).repartition(parts)
        val hits = ds.select(HeavyHitters.sketch(k).toColumn).head()
        val truth = items.groupBy(identity).map { case (i, xs) => i -> xs.size.toLong }
        val n = items.size.toLong
        val bound = n / (k + 1) // (k+1)*dec <= n => dec <= floor(n/(k+1))
        val inSketch = hits.map(h => h.item -> h.lowerBound).toMap
        val mustBePresent = truth.filter { case (_, c) => c * (k + 1) > n }.keys
        val presence = mustBePresent.forall(inSketch.contains)
        val bounds = inSketch.forall { case (i, lb) =>
          lb <= truth(i) && truth(i) - lb <= bound
        }
        val size = inSketch.size <= k
        presence && bounds && size
      }
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(res.passed, res.status.toString)
  }

  test("a dominant item surfaces with a tight lower bound") {
    val items = List.fill(900)("the") ++ (1 to 100).map(i => s"w$i").toList
    val ds = spark.createDataset(items)(Encoders.STRING).repartition(8)
    val hits = ds.select(HeavyHitters.sketch(5).toColumn).head()
    val top = hits.head
    assert(top.item == "the")
    // undercount bounded by n/(k+1) = 1000/6
    assert(top.lowerBound >= 900L - 1000L / 6)
  }
}
