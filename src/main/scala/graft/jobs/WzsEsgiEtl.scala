package graft.jobs

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.Relational

/** ESGI indicator ingestion (reference: jobs/wzsesgi_etl.py:36-78):
  * the 'NA' string sentinel becomes NULL then 0, string amounts cast to
  * double, legacy plant codes recoded, and the electricity indicator scaled
  * from MWh to kWh (*1000) before category selection.
  */
object WzsEsgiEtl {

  private val plantAliases = Map("LCM-1" -> "WOK", "LCM-2" -> "WTZ", "WIH-1" -> "WIH")

  /** The reference's `preprocess_df` + unit scaling: sentinel-to-zero amounts
    * and plant recode, as one codegen'd projection (no row loop). */
  def preprocess(df: DataFrame, scaleBy: Double = 1.0): DataFrame =
    df.withColumn("plant",
        Relational.decode(col("plant"), plantAliases, col("plant")))
      .withColumn("amount",
        coalesce(when(col("amount") =!= "NA", col("amount").cast("double")),
          lit(0.0)) * scaleBy)

  /** Select indicator categories and sum to (plant, period) grain —
    * `category_group` (reference :17-36 shape). */
  def categoryGroup(df: DataFrame, categories: Seq[String]): DataFrame =
    df.filter(col("data_name").isin(categories: _*))
      .groupBy(col("plant"), col("period_start"))
      .agg(sum(col("amount")).as("amount"))

  /** Wide month columns (jan..dec) → monthly rows with YTM and labels — the
    * reference's `cal_energy_saving` melt (reference: jobs/staging_cal.py:
    * 258-283). */
  def calEnergySaving(wide: DataFrame, category: String): DataFrame = {
    val months = Seq("jan", "feb", "mar", "apr", "may", "jun",
      "jul", "aug", "sep", "oct", "nov", "dec")
    val long = wide.unpivot(Array(col("year")),
        months.map(col).toArray, "month_name", "amount")
      .withColumn("mo",
        months.zipWithIndex.foldLeft(lit(0)) { case (acc, (m, i)) =>
          when(col("month_name") === m, lit(i + 1)).otherwise(acc)
        })
      .groupBy(col("year"), col("mo"))
      .agg(sum(col("amount")).as("amount"))
      .withColumn("period_start", make_date(col("year"), col("mo"), lit(1)))
    Relational.ytm(long, Seq("year"), "mo", "amount")
      .select(col("period_start"), col("amount"), col("ytm_amount"))
      .withColumn("category", lit("energy_efficiency"))
      .withColumn("type", lit(category))
  }
}
