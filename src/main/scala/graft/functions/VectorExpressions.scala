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

  /** Register the expressions as session functions (idempotent) — the public
    * route to a Column handle for a custom Expression. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = Registration.registry(spark)
    reg.createOrReplaceTempFunction("graft_quantized_dot",
      exprs => QuantizedDot(exprs(0), exprs(1)), "scala_udf")
    reg.createOrReplaceTempFunction("graft_quantized_norm2",
      exprs => QuantizedNorm2(exprs.head), "scala_udf")
  }

  def quantizedDot(a: Column, b: Column): Column =
    org.apache.spark.sql.functions.call_function("graft_quantized_dot", a, b)

  def quantizedNorm2(a: Column): Column =
    org.apache.spark.sql.functions.call_function("graft_quantized_norm2", a)
}
