package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Native Catalyst expressions for the similarity-search hot path.
  *
  * The composable formulation (`aggregate(zip_with(...))`) runs on Spark's
  * interpreted higher-order-function path — one closure invocation per
  * element per pair. These expressions generate a tight Java loop over the
  * primitive float arrays instead (`doGenCode`), keeping the whole knn stage
  * inside whole-stage codegen. Semantics are bit-identical to the HOF form:
  * each element is quantized to exact milli-units
  * (`(long) floor(x * 1000.0 + 0.5)`) and accumulated in a long, so the
  * result is the same exact integer the DuckDB oracle computes.
  *
  * This is preference order (b) from the build rules: a scalar `Expression`
  * with codegen, chosen over a UDF because the loop inlines into the
  * generated stage with no boxing or Row conversion.
  */
object VectorExpressions {

  private val quantJava = "(long) java.lang.Math.floor(%s * 1000.0d + 0.5d)"

  /** Exact quantized dot product of two array<float> columns → long. */
  case class QuantizedDot(left: Expression, right: Expression)
      extends BinaryExpression {

    override def dataType: DataType = LongType
    override def checkInputDataTypes()
        : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
      (left.dataType, right.dataType) match {
        case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case _ =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
            s"expected (array<float>, array<float>), got " +
              s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
      }
    }

    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val n = math.min(x.numElements(), y.numElements())
      var acc = 0L
      var i = 0
      while (i < n) {
        val xv = math.floor(x.getFloat(i) * 1000.0 + 0.5).toLong
        val yv = math.floor(y.getFloat(i) * 1000.0 + 0.5).toLong
        acc += xv * yv
        i += 1
      }
      acc
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val i = ctx.freshName("i")
        val n = ctx.freshName("n")
        val acc = ctx.freshName("acc")
        val qx = quantJava.format(s"$a.getFloat($i)")
        val qy = quantJava.format(s"$b.getFloat($i)")
        s"""
          int $n = java.lang.Math.min($a.numElements(), $b.numElements());
          long $acc = 0L;
          for (int $i = 0; $i < $n; $i++) {
            $acc += ($qx) * ($qy);
          }
          ${ev.value} = $acc;
        """
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** Exact quantized squared L2 norm of an array<float> column → long. */
  case class QuantizedNorm2(child: Expression) extends UnaryExpression {

    override def dataType: DataType = LongType

    override def nullSafeEval(a: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      var acc = 0L
      var i = 0
      val n = x.numElements()
      while (i < n) {
        val xv = math.floor(x.getFloat(i) * 1000.0 + 0.5).toLong
        acc += xv * xv
        i += 1
      }
      acc
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => {
        val i = ctx.freshName("i")
        val n = ctx.freshName("n")
        val acc = ctx.freshName("acc")
        val v = ctx.freshName("v")
        val qx = quantJava.format(s"$a.getFloat($i)")
        s"""
          int $n = $a.numElements();
          long $acc = 0L;
          for (int $i = 0; $i < $n; $i++) {
            long $v = $qx;
            $acc += $v * $v;
          }
          ${ev.value} = $acc;
        """
      })

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Nearest centroid of a quantized vector against a FOLDABLE centroid
    * matrix → struct(dist, cluster): one codegen'd k×d loop over the matrix
    * (embedded as a primitive `long[][]` reference object) replacing the
    * k-element array_min over k interpreted aggregate(zip_with(...)) chains
    * — the assignment kernel of [[graft.operators.KMeans]] (Lloyd
    * iterations, index maintenance) and [[graft.operators.Pq]] (subspace
    * encode). Semantics are identical to the HOF form: exact integer
    * squared L2 over already-quantized BIGINT vectors, ties to the LOWER
    * cluster id (the struct total order array_min implied). Inputs must be
    * null-free (the quantization transform guarantees it).
    *
    * `centsLit`/`idsLit` must be literals (typedlit) — checked at analysis
    * — so the matrix folds once per plan, not per row. */
  case class NearestCentroid(vec: Expression, centsLit: Expression,
                             idsLit: Expression)
      extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {

    override def first: Expression = vec
    override def second: Expression = centsLit
    override def third: Expression = idsLit

    override def dataType: DataType =
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("dist", LongType, nullable = false),
        org.apache.spark.sql.types.StructField("cluster", LongType, nullable = false)))

    override def checkInputDataTypes()
        : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
      val ok = (vec.dataType, centsLit.dataType, idsLit.dataType) match {
        case (ArrayType(LongType, _),
              ArrayType(ArrayType(LongType, _), _),
              ArrayType(LongType, _)) => centsLit.foldable && idsLit.foldable
        case _ => false
      }
      if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        "expected (array<bigint>, foldable array<array<bigint>>, foldable " +
          s"array<bigint>), got (${vec.dataType.simpleString}, " +
          s"${centsLit.dataType.simpleString}, ${idsLit.dataType.simpleString})")
    }

    @transient private lazy val matrix: Array[Array[Long]] = {
      val ad = centsLit.eval(null).asInstanceOf[ArrayData]
      Array.tabulate(ad.numElements())(j =>
        ad.getArray(j).toLongArray())
    }
    @transient private lazy val ids: Array[Long] =
      idsLit.eval(null).asInstanceOf[ArrayData].toLongArray()

    private def best(q: ArrayData): (Long, Long) = {
      var bestD = Long.MaxValue
      var bestC = Long.MaxValue
      var j = 0
      while (j < matrix.length) {
        val c = matrix(j)
        val n = math.min(q.numElements(), c.length)
        var acc = 0L
        var i = 0
        while (i < n) { val d = q.getLong(i) - c(i); acc += d * d; i += 1 }
        if (acc < bestD || (acc == bestD && ids(j) < bestC)) {
          bestD = acc; bestC = ids(j)
        }
        j += 1
      }
      (bestD, bestC)
    }

    override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
      val q = vec.eval(input)
      if (q == null) null
      else {
        val (d, c) = best(q.asInstanceOf[ArrayData])
        new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
          Array[Any](d, c))
      }
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (q, _, _) => {
        val m = ctx.addReferenceObj("centMatrix", matrix, "long[][]")
        val idRef = ctx.addReferenceObj("centIds", ids, "long[]")
        val j = ctx.freshName("j")
        val i = ctx.freshName("i")
        val n = ctx.freshName("n")
        val acc = ctx.freshName("acc")
        val d = ctx.freshName("d")
        val row = ctx.freshName("row")
        val bestD = ctx.freshName("bestD")
        val bestC = ctx.freshName("bestC")
        s"""
          long $bestD = Long.MAX_VALUE;
          long $bestC = Long.MAX_VALUE;
          for (int $j = 0; $j < $m.length; $j++) {
            long[] $row = $m[$j];
            int $n = java.lang.Math.min($q.numElements(), $row.length);
            long $acc = 0L;
            for (int $i = 0; $i < $n; $i++) {
              long $d = $q.getLong($i) - $row[$i];
              $acc += $d * $d;
            }
            if ($acc < $bestD || ($acc == $bestD && $idRef[$j] < $bestC)) {
              $bestD = $acc;
              $bestC = $idRef[$j];
            }
          }
          ${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
            new Object[]{java.lang.Long.valueOf($bestD), java.lang.Long.valueOf($bestC)});
        """
      })

    override protected def withNewChildrenInternal(
        newFirst: Expression, newSecond: Expression,
        newThird: Expression): Expression =
      copy(vec = newFirst, centsLit = newSecond, idsLit = newThird)
  }

  /** Register the expressions as session functions (idempotent) — the public
    * route to a Column handle for a custom Expression. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = Registration.registry(spark)
    reg.createOrReplaceTempFunction("graft_quantized_dot",
      exprs => QuantizedDot(exprs(0), exprs(1)), "scala_udf")
    reg.createOrReplaceTempFunction("graft_quantized_norm2",
      exprs => QuantizedNorm2(exprs.head), "scala_udf")
    reg.createOrReplaceTempFunction("graft_nearest_centroid",
      exprs => NearestCentroid(exprs(0), exprs(1), exprs(2)), "scala_udf")
  }

  def quantizedDot(a: Column, b: Column): Column =
    org.apache.spark.sql.functions.call_function("graft_quantized_dot", a, b)

  def quantizedNorm2(a: Column): Column =
    org.apache.spark.sql.functions.call_function("graft_quantized_norm2", a)

  def nearestCentroid(vec: Column, cents: Column, ids: Column): Column =
    org.apache.spark.sql.functions.call_function(
      "graft_nearest_centroid", vec, cents, ids)
}
