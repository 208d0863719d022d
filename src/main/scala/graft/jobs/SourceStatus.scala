package graft.jobs

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.Relational

/** Source-freshness status report (reference: jobs/fix_data.py:235-320
  * `source_status`): which (site, item, month) combinations have arrived
  * from which upstream system, labelled with user-facing source names,
  * left-joined onto the expected checklist so missing feeds surface as null
  * `type`.
  */
object SourceStatus {

  private val itemLabels = Map(
    "光伏" -> "自建太陽能", "綠電" -> "直購綠電", "綠證" -> "購買綠證")
  private val typeLabels = Map("wzs_esgi" -> "ESGI", "CSR" -> "ESG Database")

  /** @param electricity raw electricity rows (site, period_start, type)
    * @param renewable   raw renewable rows (site, category2, period_start, type)
    * @param siteMapping (site_category, site) dimension
    * @param checklist   expected (site_category, site, item, year, month, confirm) */
  def statusReport(electricity: DataFrame, renewable: DataFrame,
                   siteMapping: DataFrame, checklist: DataFrame): DataFrame = {
    val elec = electricity.filter(col("type") =!= "")
      .select(col("site"), col("period_start"), col("type"))
      .distinct()
      .withColumn("item", lit("實際用電"))
    val renew = renewable.filter(col("type") =!= "")
      .select(col("site"), col("period_start"), col("type"),
        Relational.decode(col("category2"), itemLabels, col("category2"))
          .as("item"))
      .distinct()
    val arrived = elec.unionByName(renew)
      .join(broadcast(siteMapping.select("site_category", "site").distinct()),
        Seq("site"), "left")
      .withColumn("year", year(col("period_start")))
      .withColumn("month", month(col("period_start")))
      .select(col("site"), col("type"), col("item"), col("site_category"),
        col("year"), col("month"))

    checklist
      .join(arrived, Seq("site", "item", "site_category", "year", "month"), "left")
      .withColumn("type",
        Relational.decode(col("type"), typeLabels, col("type")))
  }
}
