package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Financial aggregates the reference computes with numpy-financial over
  * year-ordered pandas groups: IRR and CAGR trend rates feeding the
  * electricity simulator (reference: Model/Factory_elect_simulator_update.py:
  * 194-202 `irr_func`, 205-211 `cagr_func`, applied per (plant, bo) at
  * :219-222).
  *
  * Implemented as typed [[Aggregator]]s (the one place SURVEY.md §7.3 calls
  * for custom expression-level code): input rows arrive unordered across
  * partitions, so the buffer accumulates (order-key, value) pairs and
  * `finish` sorts — order-insensitive merge, deterministic result. Buffers
  * stay tiny (one row per year per group), so the collect-then-sort cost is
  * bounded and the aggregation remains fully distributed.
  */
object Financial {

  /** Newton's method with bisection fallback on the NPV polynomial — the
    * same root numpy-financial's `irr` finds for well-behaved cashflows. */
  def irr(cashflows: Seq[Double], tol: Double = 1e-9, maxIter: Int = 200): Double = {
    if (cashflows.size < 2 || cashflows.forall(_ >= 0) || cashflows.forall(_ <= 0))
      return Double.NaN
    def npv(r: Double): Double = {
      var acc = 0.0
      var i = 0
      cashflows.foreach { cf => acc += cf / math.pow(1.0 + r, i); i += 1 }
      acc
    }
    def dnpv(r: Double): Double = {
      var acc = 0.0
      var i = 0
      cashflows.foreach { cf =>
        if (i > 0) acc += -i * cf / math.pow(1.0 + r, i + 1)
        i += 1
      }
      acc
    }
    var r = 0.1
    var it = 0
    while (it < maxIter) {
      val f = npv(r)
      if (math.abs(f) < tol) return r
      val d = dnpv(r)
      if (d == 0.0 || !java.lang.Double.isFinite(d)) it = maxIter
      else {
        val next = r - f / d
        if (next <= -1.0) r = (r - 1.0) / 2.0 else r = next
      }
      it += 1
    }
    // bisection fallback over (-0.999, 10)
    var lo = -0.999
    var hi = 10.0
    if (npv(lo) * npv(hi) > 0) return Double.NaN
    var k = 0
    while (k < 200) {
      val mid = (lo + hi) / 2
      if (npv(lo) * npv(mid) <= 0) hi = mid else lo = mid
      k += 1
    }
    (lo + hi) / 2
  }

  /** CAGR over an ordered series: (last/first)^(1/(n-1)) - 1
    * (reference: Model/Factory_elect_simulator_update.py:205-211). */
  def cagr(ordered: Seq[Double]): Double = {
    if (ordered.size < 2) return Double.NaN
    val first = ordered.head
    val last = ordered.last
    if (first <= 0 || last <= 0) return Double.NaN
    math.pow(last / first, 1.0 / (ordered.size - 1)) - 1.0
  }

  /** Bisection IRR over (year-offset k, cashflow) pairs on a fixed bracket
    * chosen so the bracket-existence test is exact-integer cross-engine:
    * lo = -15/16 (1+lo = 1/16 exactly) and hi = 15 (1+hi = 16 exactly), so
    * the NPV signs at the bracket ends are signs of Σ cf_cents·16^k and
    * Σ cf_cents·16^(kmax−k) — pure shifted-integer sums ANSI SQL computes
    * bit-identically. Bisection runs to the double ulp floor, so
    * |NPV(root)| / Σ|cf| is ~1e-12 for any bracketed series.
    *
    * @return (irr, NPV(irr)/Σ|cf|) — (NaN, NaN) when the bracket does not
    *         straddle a sign change. */
  def bisectIrr(pairs: Seq[(Int, Double)]): (Double, Double) = {
    if (pairs.size < 2) return (Double.NaN, Double.NaN)
    val sorted = pairs.sortBy(_._1)
    def npv(r: Double): Double = {
      var acc = 0.0
      sorted.foreach { case (k, cf) => acc += cf / math.pow(1.0 + r, k.toDouble) }
      acc
    }
    var lo = -0.9375
    var hi = 15.0
    val fLo = npv(lo)
    if (fLo == 0.0 || fLo * npv(hi) > 0) return (Double.NaN, Double.NaN)
    var i = 0
    while (i < 100) { // 100 iterations bisects past the double ulp floor
      val mid = (lo + hi) / 2
      if (fLo * npv(mid) <= 0) hi = mid else lo = mid
      i += 1
    }
    val root = (lo + hi) / 2
    val scale = sorted.iterator.map { case (_, cf) => math.abs(cf) }.sum
    (root, if (scale == 0.0) Double.NaN else npv(root) / scale)
  }

  private type KV = (Int, Double)

  /** IRR over (order-key, cashflow) rows within a group. */
  object IrrAggregator extends Aggregator[KV, List[KV], Double] {
    override def zero: List[KV] = Nil
    override def reduce(b: List[KV], a: KV): List[KV] = a :: b
    override def merge(b1: List[KV], b2: List[KV]): List[KV] = b1 ::: b2
    override def finish(b: List[KV]): Double = irr(b.sortBy(_._1).map(_._2))
    override def bufferEncoder: Encoder[List[KV]] = Encoders.kryo[List[KV]]
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** CAGR over (order-key, value) rows within a group. */
  object CagrAggregator extends Aggregator[KV, List[KV], Double] {
    override def zero: List[KV] = Nil
    override def reduce(b: List[KV], a: KV): List[KV] = a :: b
    override def merge(b1: List[KV], b2: List[KV]): List[KV] = b1 ::: b2
    override def finish(b: List[KV]): Double = cagr(b.sortBy(_._1).map(_._2))
    override def bufferEncoder: Encoder[List[KV]] = Encoders.kryo[List[KV]]
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Relative NPV residual of the bisection IRR over (year-offset, cashflow)
    * rows — the cross-engine-checkable face of IRR: the oracle can't run the
    * root-finder, but it CAN verify the bracket (exact integers) and assert
    * the residual is 0 at the emitted rounding (a wrong or unconverged root
    * leaves an O(1) relative residual). */
  object IrrResidualAggregator extends Aggregator[KV, List[KV], Double] {
    override def zero: List[KV] = Nil
    override def reduce(b: List[KV], a: KV): List[KV] = a :: b
    override def merge(b1: List[KV], b2: List[KV]): List[KV] = b1 ::: b2
    override def finish(b: List[KV]): Double = bisectIrr(b)._2
    override def bufferEncoder: Encoder[List[KV]] = Encoders.kryo[List[KV]]
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Column-API handles: `df.groupBy(...).agg(irrAgg(col("yr"), col("cf")))`. */
  val irrAgg = org.apache.spark.sql.functions.udaf(IrrAggregator,
    Encoders.product[KV])
  val cagrAgg = org.apache.spark.sql.functions.udaf(CagrAggregator,
    Encoders.product[KV])
  val irrResidualAgg = org.apache.spark.sql.functions.udaf(IrrResidualAggregator,
    Encoders.product[KV])
}
