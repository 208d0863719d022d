package graft.queries

import org.apache.spark.sql.functions._
import graft.functions.{Financial, Money}
import Q._

/** Custom-aggregate queries (SURVEY.md §2.10 A3/A4): IRR and CAGR trend
  * rates per group, the reference's numpy-financial step
  * (reference: Model/Factory_elect_simulator_update.py:194-222).
  *
  * Not ANSI-SQL-expressible (Newton iteration), so no DuckDB oracle — the
  * driver records rows-only checks; exact-value coverage lives in
  * FinancialSpec against hand-computed series.
  */
object FinancialQueries {

  val all: Seq[Q] = Seq(

    // IRR of a synthetic per-customer cashflow series: 1995 spend is the
    // outlay (negative), later years are returns — the reference's shape of
    // "investment year then payback stream".
    Q("f01_irr_by_customer",
      (s, dir) => {
        val yearly = T(s, dir, "orders")
          .filter(col("o_custkey") < 100)
          .groupBy(col("o_custkey"), year(col("o_orderdate")).as("yr"))
          .agg((sum(Money.cents(col("o_totalprice"))) / 100.0).as("amount"))
          .withColumn("cf",
            when(col("yr") === 1995, -col("amount")).otherwise(col("amount")))
        yearly.groupBy(col("o_custkey"))
          .agg(Financial.irrAgg(col("yr"), col("cf")).as("irr"),
            count(lit(1)).as("n_years"))
          .filter(!isnan(col("irr")))
      },
      None),

    // CAGR of yearly revenue per order priority.
    Q("f02_cagr_by_priority",
      (s, dir) => {
        val yearly = T(s, dir, "orders")
          .groupBy(col("o_orderpriority"), year(col("o_orderdate")).as("yr"))
          .agg((sum(Money.cents(col("o_totalprice"))) / 100.0).as("amount"))
        yearly.groupBy(col("o_orderpriority"))
          .agg(Financial.cagrAgg(col("yr"), col("amount")).as("cagr"),
            count(lit(1)).as("n_years"))
      },
      None)
  )
}
