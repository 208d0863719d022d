package graft.jobs

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.Relational

/** Scope-1/scope-2 carbon-emission computation, the reference's
  * staging→app calculation core (reference: jobs/staging_cal.py:41-107).
  *
  * Semantics preserved:
  *  - scope-2 (market / location): per (site, period) electricity minus the
  *    applicable renewable offset, times the site's carbon coefficient,
  *    /1000 to tonnes (:45-53), summed over sites per period;
  *  - missing offsets and coefficients are zero-filled (`fillna(0)`, :46);
  *  - coefficient decode of site aliases before join (:35-37);
  *  - scope-1 is estimated from scope-2 location via the fixed factor
  *    `x * 0.06/(1-0.06)` (:95-99);
  *  - scope1n2 = scope-1 + scope-2-market, re-aggregated per period (:101-104).
  */
object StagingCal {

  /** (site, period_start, amount, ytm_amount) × offsets × coefficients →
    * per-period emission totals in tonnes. */
  def scope2(elect: DataFrame, renewableOffset: DataFrame, coef: DataFrame): DataFrame = {
    val offset = renewableOffset
      .select(col("site"), col("period_start"),
        col("amount").as("off_amount"), col("ytm_amount").as("off_ytm"))
    elect
      .join(offset, Seq("site", "period_start"), "left")
      .join(broadcast(coef.select(col("site"), col("coef")).distinct()),
        Seq("site"), "left")
      .na.fill(0.0, Seq("off_amount", "off_ytm", "coef"))
      .withColumn("em_amount",
        (col("amount") - col("off_amount")) * col("coef") / 1000.0)
      .withColumn("em_ytm",
        (col("ytm_amount") - col("off_ytm")) * col("coef") / 1000.0)
      .groupBy(col("period_start"))
      .agg(sum(col("em_amount")).as("amount"), sum(col("em_ytm")).as("ytm_amount"))
  }

  /** Scope-1 estimate from the location-based scope-2 (fixed 6% factor). */
  def scope1(scope2Location: DataFrame): DataFrame = {
    val f = lit(0.06) / (lit(1.0) - lit(0.06))
    scope2Location
      .withColumn("amount", col("amount") * f)
      .withColumn("ytm_amount", col("ytm_amount") * f)
  }

  /** scope1 + scope2-market per period. */
  def scope1n2(scope1All: DataFrame, scope2Market: DataFrame): DataFrame =
    scope1All.unionByName(scope2Market)
      .groupBy(col("period_start"))
      .agg(sum(col("amount")).as("amount"), sum(col("ytm_amount")).as("ytm_amount"))

  /** Reduction percentage versus a reference series (reference:
    * jobs/elect_target_etl.py:226-240 decarb simulate — `(current - base) /
    * base` per period; also jobs/staging_cal.py:181-184 YoY%). Zero/null
    * baselines yield null, the replace(0, nan) idiom. */
  def reductionPct(current: DataFrame, baseline: DataFrame): DataFrame = {
    val base = baseline.select(col("period_start"),
      col("amount").as("base_amount"))
    current.join(base, Seq("period_start"), "left")
      .withColumn("reduction_pct",
        graft.functions.Money.safeDiv(
          col("amount") - col("base_amount"), col("base_amount")))
      .select(col("period_start"), col("amount"), col("base_amount"),
        col("reduction_pct"))
  }

  /** Carbon-coefficient preprocessing (reference :29-38): decode site
    * aliases, dedupe. */
  def coefPreprocess(coef: DataFrame, siteAliases: Map[String, String]): DataFrame =
    coef.withColumn("site",
        Relational.decode(col("site"), siteAliases, col("site")))
      .distinct()
}
