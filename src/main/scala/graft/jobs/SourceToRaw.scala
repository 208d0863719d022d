package graft.jobs

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.Relational

/** source→raw ingestion transforms (reference: jobs/source_to_raw package).
  *
  * fem_ratio (reference: fem_ratio.py:5-25): month of daily meter readings →
  * each plant's share of its site's total power. The reference computes a
  * `transform('sum')` then divides by the grand total (one site per call);
  * here it is one aggregate plus a share-of-group window, valid for any
  * number of sites in one pass.
  */
object SourceToRaw {

  /** @param femDaily (plant_code, datadate, power) daily meter rows, already
    *                 bounded to the refresh month
    * @param plantMap (site, plant, plant_code) distinct mapping */
  def femRatio(femDaily: DataFrame, plantMap: DataFrame,
               periodStart: java.sql.Date): DataFrame = {
    val monthly = femDaily
      .join(plantMap.distinct(), Seq("plant_code"))
      .na.drop(Seq("site", "plant", "power"))
      .groupBy(col("site"), col("plant"))
      .agg(sum(col("power")).as("amount"))
    Relational.shareOfGroup(monthly, Seq("site"), "amount")
      .withColumn("period_start", lit(periodStart))
  }

  private def stamp(df: DataFrame, clock: graft.core.Clock): DataFrame =
    df.withColumn("last_update_time",
      lit(java.sql.Timestamp.valueOf(clock.today.atStartOfDay())))

  /** raw.solar_ratio (reference: jobs/source_to_raw/solar_ratio.py): the
    * four WZS solar plants' share of the month's total generation. The
    * grand-total share is a global window over a four-row frame — fine
    * here; for a large frame use the two-step aggregate instead.
    *
    * @param renewableEnergy raw.renewable_energy:
    *                        (plant, amount, period_start, category1, category2) */
  def solarRatio(renewableEnergy: DataFrame, periodStart: java.sql.Date,
                 clock: graft.core.Clock): DataFrame = {
    val wzs = renewableEnergy
      .filter(col("category1") === "綠色能源" && col("category2") === "光伏" &&
        col("plant").isin("WZS-1", "WZS-3", "WZS-6", "WZS-8") &&
        col("period_start") === lit(periodStart))
      .select(col("plant"), col("amount"), col("period_start"))
    stamp(Relational.shareOfGroup(wzs, Nil, "amount")
      .na.drop().dropDuplicates(), clock)
  }

  /** raw.fem_ratio_solar (reference: jobs/source_to_raw/fem_ratio_solar.py):
    * WKS/XTRKS plants' share of the month's total metered power — like
    * [[femRatio]] but the denominator is the GLOBAL total across both
    * sites, not per-site. */
  def femRatioSolar(femDaily: DataFrame, plantMap: DataFrame,
                    periodStart: java.sql.Date,
                    clock: graft.core.Clock): DataFrame = {
    val monthly = femDaily
      .join(broadcast(plantMap.distinct()), Seq("plant_code"))
      .na.drop(Seq("site", "plant", "power"))
      .groupBy(col("site"), col("plant"))
      .agg(sum(col("power")).as("power"))
    stamp(Relational.shareOfGroup(monthly, Nil, "power")
      .withColumn("period_start", lit(periodStart))
      .na.drop(), clock)
  }

  /** raw.solar rows from the REST monthly payload (reference:
    * jobs/source_to_raw/solar.py:111-134): the zipped (datetime, actual,
    * target) frame splits into actual/target category rows with a
    * month-start date parsed from the `yyyy-M` strings. */
  def solarMonth(monthly: DataFrame, site: String): DataFrame = {
    def slice(valueCol: String, category: String) = monthly
      .select(col(valueCol).as("amount"),
        to_date(col("datetime"), "yyyy-M").as("period_start"))
      .withColumn("plant", lit(site))
      .withColumn("category", lit(category))
    slice("actual", "actual").unionByName(slice("target", "target"))
  }
}
