package graft.jobs

import java.sql.Timestamp
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Serving-layer transforms (reference: jobs/staging_to_app.py).
  *
  * The tariff machinery: pick each area's applicable rule set, join bills to
  * it, and split summer/non-summer pricing by whether the billing period
  * falls inside the rule's seasonal window (reference :100-140).
  */
object StagingToApp {

  /** Applicable tariff rule per area (reference :111-113, the
    * `groupby(area).apply(idxmax if max < now else idxmin)` quirk): take the
    * latest rule when every rule predates `now`, otherwise the earliest —
    * expressed as one window pass (conditional sort direction via a
    * per-area max), no groupby-apply. */
  def applicableTariff(rules: DataFrame, now: Timestamp): DataFrame = {
    val wArea = Window.partitionBy(col("area"))
    val withMax = rules.withColumn("__max_gd", max(col("guideline_date")).over(wArea))
    val pick = Window.partitionBy(col("area")).orderBy(
      when(col("__max_gd") < lit(now), col("guideline_date").cast("long") * -1)
        .otherwise(col("guideline_date").cast("long")).asc,
      col("base_id").asc)
    withMax.withColumn("__rn", row_number().over(pick))
      .filter(col("__rn") === 1)
      .drop("__max_gd", "__rn")
  }

  /** Seasonal tariff split (reference :132-140): a bill row keeps the summer
    * price exactly when its period falls inside [start_date, end_date] and
    * the row is the summer tariff — i.e. the two filter+append branches are
    * the single predicate `in_window == is_summer` (branches are disjoint,
    * so the union equals the filter). */
  def seasonalSplit(priced: DataFrame): DataFrame =
    priced.filter(
      col("period_start").between(col("start_date"), col("end_date"))
        === col("is_summer"))
      .dropDuplicates()
}
