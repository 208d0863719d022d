package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine-deterministic numeric helpers.
  *
  * Monetary columns in the test tables are DOUBLEs with fixed decimal scale.
  * A plain `sum(double)` is order-dependent in the last ulp, and Spark's
  * partial aggregation over 32 partitions sums in a different order than a
  * single-threaded oracle — so hash-comparison against DuckDB would flake.
  * Scaling each row to an exact integer first (one row-local IEEE expression,
  * identical in any engine) makes the subsequent sum exact and associative.
  *
  * The reference has the same class of issue hidden by pandas' single-threaded
  * eager sums (e.g. `green_elect['amount'].astype(float)` then groupby-sum,
  * reference: jobs/raw_to_staging.py:175,503-504); at cluster scale the integer
  * formulation is the one that stays deterministic.
  */
object Money {
  /** Exact cents: floor(x*100 + 0.5) as BIGINT. Round-half-up for positives,
    * deterministic for negatives (floor toward -inf in every engine). */
  def cents(c: Column): Column = floor(c * lit(100.0) + lit(0.5)).cast("long")

  /** Exact 1e-4 units, for products of two 2-decimal columns
    * (e.g. price * (1 - discount)). */
  def e4(c: Column): Column = floor(c * lit(10000.0) + lit(0.5)).cast("long")

  /** Division that never divides by zero: NULL when `den` is 0. Mirrors the
    * reference's replace(0, NaN)-before-divide idiom
    * (reference: macc_summary/macc_input_to_summary.py:226-238). */
  def safeDiv(num: Column, den: Column): Column =
    when(den =!= lit(0), num / den)

  /** Ratio of two exact-integer aggregates as a single double division —
    * deterministic because both operands are exact. */
  def ratio(numInt: Column, denInt: Column): Column =
    safeDiv(numInt.cast("double"), denInt.cast("double"))
}
