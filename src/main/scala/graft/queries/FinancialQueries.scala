package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.{Financial, Money}
import Q._

/** Custom-aggregate queries (SURVEY.md §2.10 A3/A4): IRR and CAGR trend
  * rates per group, the reference's numpy-financial step
  * (reference: Model/Factory_elect_simulator_update.py:194-222).
  *
  * Both are on the hard hash-match surface despite Newton/bisection not
  * being ANSI-SQL:
  *  - f01 emits the exact-integer bracket test (signs of shifted-cents sums
  *    both engines compute bit-identically) plus the relative NPV residual of
  *    the found root, rounded — 0 iff the engine's IRR really is a root;
  *  - f02 emits CAGR rounded to 1e-6 with an IEEE-identical formulation on
  *    both sides (exact-cents first/last via arg_min/arg_max by year); the
  *    only cross-libm op is one pow(), guarded by the rounding.
  * Raw-rate value coverage stays in FinancialSpec against hand-computed
  * series.
  */
object FinancialQueries {

  val all: Seq[Q] = Seq(

    // IRR of a synthetic per-customer cashflow series: 1995 spend is the
    // outlay (negative), later years are returns — the reference's shape of
    // "investment year then payback stream". Groups are kept only when the
    // fixed bracket (-15/16, 15) straddles a sign change — a test both
    // engines evaluate on exact integers: NPV sign at lo is the sign of
    // Σ cf_cents·16^k, at hi of Σ cf_cents·16^(kmax−k).
    Q("f01_irr_by_customer",
      (s, dir) => {
        val yearly = T(s, dir, "orders")
          .filter(col("o_custkey") < 100)
          .groupBy(col("o_custkey"), year(col("o_orderdate")).as("yr"))
          .agg(sum(Money.cents(col("o_totalprice"))).as("c"))
          .withColumn("cf_cents",
            when(col("yr") === 1995, -col("c")).otherwise(col("c")))
        val w = Window.partitionBy(col("o_custkey"))
        val withK = yearly
          .withColumn("k", (col("yr") - min(col("yr")).over(w)).cast("int"))
          .withColumn("kmax",
            (max(col("yr")).over(w) - min(col("yr")).over(w)).cast("int"))
        withK.groupBy(col("o_custkey"))
          .agg(
            count(lit(1)).as("n_years"),
            (sum(col("cf_cents")) / 100.0).as("net_cf"),
            sum(expr("shiftleft(cf_cents, 4*k)")).as("s_lo"),
            sum(expr("shiftleft(cf_cents, 4*(kmax-k))")).as("s_hi"),
            Financial.irrResidualAgg(col("k"), col("cf_cents") / 100.0)
              .as("res"))
          .filter((col("s_lo") < 0 && col("s_hi") > 0) ||
            (col("s_lo") > 0 && col("s_hi") < 0))
          .select(col("o_custkey"), col("n_years"), col("net_cf"),
            floor(col("res") * 1e4 + 0.5).cast("long").as("npv_zero"))
      },
      Some(s"""WITH yearly AS (
          SELECT o_custkey, CAST(year(o_orderdate) AS INTEGER) AS yr,
            ${sqlSumC("o_totalprice")} AS c
          FROM orders WHERE o_custkey < 100 GROUP BY 1, 2),
        cf AS (
          SELECT o_custkey, yr,
            CASE WHEN yr = 1995 THEN -c ELSE c END AS cf_cents,
            yr - min(yr) OVER (PARTITION BY o_custkey) AS k,
            max(yr) OVER (PARTITION BY o_custkey)
              - min(yr) OVER (PARTITION BY o_custkey) AS kmax
          FROM yearly),
        g AS (
          SELECT o_custkey, count(*) AS n_years,
            CAST(sum(cf_cents) AS BIGINT)/100.0 AS net_cf,
            sum(cf_cents * (CAST(1 AS BIGINT) << (4*k))) AS s_lo,
            sum(cf_cents * (CAST(1 AS BIGINT) << (4*(kmax-k)))) AS s_hi
          FROM cf GROUP BY 1)
        SELECT o_custkey, n_years, net_cf, CAST(0 AS BIGINT) AS npv_zero
        FROM g
        WHERE (s_lo < 0 AND s_hi > 0) OR (s_lo > 0 AND s_hi < 0)""")),

    // CAGR of yearly revenue per order priority: exact-cents first/last year
    // amounts, identical double division chain on both sides, one pow().
    Q("f02_cagr_by_priority",
      (s, dir) => {
        val yearly = T(s, dir, "orders")
          .groupBy(col("o_orderpriority"), year(col("o_orderdate")).as("yr"))
          .agg((sum(Money.cents(col("o_totalprice"))) / 100.0).as("amount"))
        yearly.groupBy(col("o_orderpriority"))
          .agg(Financial.cagrAgg(col("yr"), col("amount")).as("cagr_raw"),
            count(lit(1)).as("n_years"))
          .select(col("o_orderpriority"),
            floor(col("cagr_raw") * 1e6 + 0.5).cast("long").as("cagr_e6"),
            col("n_years"))
      },
      Some(s"""WITH yearly AS (
          SELECT o_orderpriority, CAST(year(o_orderdate) AS INTEGER) AS yr,
            ${sqlSumC("o_totalprice")} AS c
          FROM orders GROUP BY 1, 2),
        g AS (
          SELECT o_orderpriority, count(*) AS n_years,
            arg_min(c, yr) AS first_c, arg_max(c, yr) AS last_c
          FROM yearly GROUP BY 1)
        SELECT o_orderpriority,
          CAST(floor((pow((CAST(last_c AS DOUBLE)/100.0)
            / (CAST(first_c AS DOUBLE)/100.0),
            1.0/(n_years - 1)) - 1.0) * 1000000.0 + 0.5) AS BIGINT) AS cagr_e6,
          n_years
        FROM g"""))
  )
}
