package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{TextExpressions, VectorExpressions}

/** Catalyst extension entry point: registers the engine's native
  * expressions at session build via
  * `.config("spark.sql.extensions", "graft.GraftExtensions")` — the
  * canonical injection route, equivalent to the imperative
  * `TextExpressions.register(spark)` / `VectorExpressions.register(spark)`
  * calls the query layer makes, but available to ANY session (spark-sql,
  * thrift server, notebooks) without graft code running first.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft", null, name, usage, "", "", "", "", "", "", "built-in")

  override def apply(ext: SparkSessionExtensions): Unit = {
    // whole-operator tier: the native as-of join (graft.plans.AsofJoinNode
    // -> AsofJoinExec); AsofJoin.asof also self-registers per session for
    // sessions built without this static conf
    ext.injectPlannerStrategy(_ => new graft.plans.AsofJoinStrategy)
    // optimizer tier: teach Catalyst the as-of node's algebra — these run
    // inside the fixed-point operator-optimization batch, so filters pushed
    // through the node keep flowing down to the parquet scans
    ext.injectOptimizerRule(_ => graft.plans.AsofFilterPushdown)
    ext.injectOptimizerRule(_ => graft.plans.AsofPayloadPruning)
    ext.injectFunction((FunctionIdentifier("graft_quantized_dot"),
      info("graft_quantized_dot",
        "exact quantized (1e-3) integer dot product of two array<float>"),
      (exprs: Seq[Expression]) =>
        VectorExpressions.QuantizedDot(exprs(0), exprs(1))))
    ext.injectFunction((FunctionIdentifier("graft_quantized_norm2"),
      info("graft_quantized_norm2",
        "exact quantized (1e-3) integer squared L2 norm of array<float>"),
      (exprs: Seq[Expression]) =>
        VectorExpressions.QuantizedNorm2(exprs.head)))
    ext.injectFunction((FunctionIdentifier("graft_nearest_centroid"),
      info("graft_nearest_centroid",
        "argmin struct(dist, cluster) of a quantized vector over a foldable centroid matrix"),
      (exprs: Seq[Expression]) =>
        VectorExpressions.NearestCentroid(exprs(0), exprs(1), exprs(2))))
    ext.injectFunction((FunctionIdentifier("graft_char_grams"),
      info("graft_char_grams",
        "distinct character n-grams of a string, first-occurrence order"),
      (exprs: Seq[Expression]) =>
        TextExpressions.DistinctCharGrams(exprs(0),
          exprs(1).eval(null).asInstanceOf[Number].intValue())))
    ext.injectFunction((FunctionIdentifier("graft_rolling_min_hash"),
      info("graft_rolling_min_hash",
        "minimum Rabin-Karp polynomial hash over all n-char windows"),
      (exprs: Seq[Expression]) =>
        TextExpressions.RollingMinHash(exprs(0),
          exprs(1).eval(null).asInstanceOf[Number].intValue(),
          exprs(2).eval(null).asInstanceOf[Number].longValue(),
          exprs(3).eval(null).asInstanceOf[Number].longValue())))
    ext.injectFunction((FunctionIdentifier("graft_sorted_intersect_size"),
      info("graft_sorted_intersect_size",
        "intersection size of two sorted duplicate-free array<int>"),
      (exprs: Seq[Expression]) =>
        TextExpressions.SortedIntersectSize(exprs(0), exprs(1))))
    ext.injectFunction((FunctionIdentifier("graft_unordered_pairs"),
      info("graft_unordered_pairs",
        "all unordered pairs of a distinct array<bigint> as struct(a=min, b=max)"),
      (exprs: Seq[Expression]) =>
        graft.functions.GraphExpressions.UnorderedPairs(exprs(0))))
  }
}
