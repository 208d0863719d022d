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
}
