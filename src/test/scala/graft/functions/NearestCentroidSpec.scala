package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** The native argmin kernel must agree with an independent driver-side
  * reference on BOTH execution paths — generated code (the DataFrame run)
  * and interpreted eval (constant-folding / fallback contexts) — including
  * distance ties (lower cluster id wins) and Long-range arithmetic. */
class NearestCentroidSpec extends SparkSpec {
  import spark.implicits._

  private def reference(q: Array[Long], cents: Seq[(Long, Array[Long])]): (Long, Long) =
    cents.map { case (id, c) =>
      val n = math.min(q.length, c.length)
      var acc = 0L
      var i = 0
      while (i < n) { val d = q(i) - c(i); acc += d * d; i += 1 }
      (acc, id)
    }.min

  private val gen = for {
    dim <- Gen.choose(1, 8)
    k <- Gen.choose(1, 5)
    vecs <- Gen.listOfN(6, Gen.listOfN(dim, Gen.choose(-2000L, 2000L)))
    cents <- Gen.listOfN(k, Gen.listOfN(dim, Gen.choose(-2000L, 2000L)))
  } yield (vecs.map(_.toArray), cents.map(_.toArray))

  test("codegen path matches the driver-side reference (property)") {
    val prop = Prop.forAll(gen) { case (vecs, cents) =>
      val books = cents.zipWithIndex.map { case (c, j) => (j.toLong, c) }
      val got = vecs.zipWithIndex.toDF("qv", "i")
        .withColumn("best", graft.operators.KMeans.bestCentroid(books, col("qv")))
        .select(col("i"), col("best.dist"), col("best.cluster"))
        .collect().map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      vecs.zipWithIndex.forall { case (q, i) => got(i) == reference(q, books) }
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(8), prop)
    assert(res.passed, res.status.toString)
  }

  test("interpreted eval path matches the reference, ties to the lower id") {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.catalyst.expressions.{BoundReference, Literal}
    import org.apache.spark.sql.types._
    // two centroids EQUIDISTANT from the query: id 0 must win
    val cents = Seq((0L, Array(10L, 0L)), (1L, Array(-10L, 0L)))
    val expr = VectorExpressions.NearestCentroid(
      BoundReference(0, ArrayType(LongType), nullable = true),
      Literal.create(cents.map(_._2.toSeq), ArrayType(ArrayType(LongType))),
      Literal.create(cents.map(_._1), ArrayType(LongType)))
    val row = InternalRow(ArrayData.toArrayData(Array(0L, 7L)))
    val got = expr.eval(row).asInstanceOf[InternalRow]
    assert((got.getLong(0), got.getLong(1)) == (149L, 0L)) // 100+49, tie -> id 0
    // null input -> null result (row survives, matches nothing)
    assert(expr.eval(InternalRow(null)) == null)
  }
}
