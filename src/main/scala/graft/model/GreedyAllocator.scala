package graft.model

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Greedy capacitated allocation over a price-ranked list with a per-year
  * budget — the core of the reference's renewable-purchase optimizer
  * (reference: Model/RE_purpose_optimizer.py:193-324): rank areas by price
  * within each year (`rank('first')`, :190-191), rank 1 takes
  * `min(capacity, remaining_budget)`, each later rank takes from what the
  * cheaper ranks left, optionally floored to 1-MWh lots (:284-285).
  *
  * The reference implements this as a sequential driver loop over ranks
  * (one merge + np.where pass per rank). That loop has a closed form: since
  * every allocation is `min(capacity, remaining)`, the budget consumed by
  * ranks < i is `min(budget, Σ_{j<i} capacity_j)`, so
  *
  *   allocated_i = clamp(budget − Σ_{j<i} capacity_j, 0, capacity_i)
  *
  * — one window cumsum per year, fully distributed, no rank iteration. Lot
  * flooring folds in by flooring capacities and the budget to the lot size
  * (all allocations are then lot multiples, preserving the invariant).
  * At 100 TB-scale inputs this is one shuffle on `year`; the reference's
  * formulation would be `max(rank)` sequential joins.
  */
object GreedyAllocator {

  /** @param items   (yearCol, itemCols..., priceCol, capacityCol)
    * @param budgets (yearCol, budgetCol) one row per year
    * @param lotSize optional allocation granularity (reference RECs: 1000)
    * @return items + price_rank, allocated
    */
  def allocate(items: DataFrame, budgets: DataFrame, yearCol: String,
               priceCol: String, capacityCol: String, budgetCol: String,
               tiebreakCols: Seq[String], lotSize: Option[Double] = None): DataFrame = {
    val lot = lotSize.getOrElse(0.0)
    def floorLot(c: org.apache.spark.sql.Column) =
      if (lotSize.isDefined) floor(c / lot) * lot else c

    val rankW = Window.partitionBy(col(yearCol))
      .orderBy(col(priceCol).asc +: tiebreakCols.map(col(_).asc): _*)
    val prevW = rankW.rowsBetween(Window.unboundedPreceding, -1)

    items
      .join(budgets.select(col(yearCol), col(budgetCol)), Seq(yearCol), "left")
      .na.fill(0.0, Seq(budgetCol))
      .withColumn("__cap", floorLot(greatest(col(capacityCol), lit(0.0))))
      .withColumn("price_rank", row_number().over(rankW))
      .withColumn("__consumed",
        coalesce(sum(col("__cap")).over(prevW), lit(0.0)))
      .withColumn("allocated",
        greatest(lit(0.0),
          least(col("__cap"), floorLot(col(budgetCol)) - col("__consumed"))))
      .drop("__cap", "__consumed")
  }
}
