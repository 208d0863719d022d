package graft.jobs

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.Relational

/** CSR-system ingestion into the raw layer (reference: jobs/csr_etl.py:
  * 43-120 `csr_replace`): site-alias consolidation, positive-value filter,
  * year/month string parts → `period_start`, category decode, and constant
  * unit/type stamps.
  *
  * The reference iterates month-at-a-time from 2023-01 to now — one query +
  * keyed DELETE/append per month (SURVEY.md §4.1 "incremental recompute").
  * Here the transform runs over the whole window in ONE plan; the refresh is
  * a single dynamic partition overwrite on `period_start`
  * ([[graft.core.Sink.overwritePartitions]]), which is both the vectorized
  * form of that loop and the shape that survives 100 TB (the loop would be
  * O(months) full scans).
  */
object CsrEtl {

  private val electSiteAliases = Map(
    "WIHK-1" -> "WIHK", "WIHK-2" -> "WIHK", "WMY-1" -> "WMY", "WMY-2" -> "WMY",
    "WCD-1" -> "WCD", "WCD-2" -> "WCD", "WCCD" -> "WCD")
  private val renewSiteAliases = Map(
    "WIHK1" -> "WIHK", "WIHK2" -> "WIHK", "WMYP1" -> "WMY", "WMYP2" -> "WMY")
  private val renewCategoryAliases = Map(
    "轉供綠電總電量" -> "綠電", "轉供綠電電量" -> "綠電")

  /** electricity_total_decarb slice: backstage plant readings (aliased,
    * summed to site grain) plus the WZS/WKS mirror rows (reference :43-77). */
  def electricity(backstage: DataFrame, wzksMirror: DataFrame): DataFrame = {
    val plants = backstage
      .filter(col("amount") > 0 && !col("site").isin("WHC", "WMCQ"))
      .withColumn("site",
        Relational.decode(col("site"), electSiteAliases, col("site")))
      .groupBy(col("site"), col("period_start"))
      .agg(sum(col("amount")).as("amount"))
    val mirror = wzksMirror
      .filter(col("amount") > 0 && col("site").isin("WZS", "WKS"))
      .select(col("site"), col("period_start"), col("amount"))
    plants.unionByName(mirror)
      .withColumn("unit", lit("度"))
      .withColumn("type", lit("CSR"))
  }

  /** renewable_energy_decarb slice: indicator rows with year/month string
    * parts, alias + category decode (reference :81-120). */
  def renewable(indicators: DataFrame): DataFrame =
    indicators
      .filter(col("amount") > 0)
      .na.drop(Seq("site", "year", "month", "amount"))
      .withColumn("site",
        Relational.decode(col("site"), renewSiteAliases, col("site")))
      .withColumn("category2",
        Relational.decode(col("category2"), renewCategoryAliases, col("category2")))
      .withColumn("period_start",
        Relational.monthStart(col("year").cast("int"), col("month").cast("int")))
      .withColumn("category1", lit("綠色能源"))
      .withColumn("unit", lit("度"))
      .withColumn("type", lit("CSR"))
      .select(col("category1"), col("category2"), col("amount"), col("site"),
        col("period_start"), col("type"), col("unit"))
}
