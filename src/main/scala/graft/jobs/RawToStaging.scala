package graft.jobs

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Clock

/** Spark-native port of the reference's raw→staging transforms, I/O-free:
  * jobs take input DataFrames and return the staging DataFrame, so tests
  * inject fixtures exactly the way the reference's unit tests patch
  * `pd_read_sql` (reference: tests/jobs_source_to_raw_test.py:12-55), and the
  * production wiring reads parquet/JDBC and writes via
  * [[graft.core.Sink.overwritePartitions]] (the S7 delete-then-append
  * refresh).
  */
object RawToStaging {

  /** The flagship slice (SURVEY.md §7.2): staging.electricity_decarb
    * (reference: jobs/raw_to_staging.py:921-977).
    *
    * Semantics preserved exactly, including the reference's quirks:
    *  - CSR-sourced electricity gets the esgi solar amount added via a
    *    left join on (site, period_start, type='CSR'); esgi-sourced rows
    *    keep their amount (solar null→0) — the 11/24 comment block;
    *  - YTM is a per-(year, site) running total ordered by month;
    *  - `cal_bo_site` (reference: jobs/raw_to_staging.py:14-59): inner-join
    *    filter to boundary sites, then EVERY detail row gets the literal
    *    bo='ALL', and the rollup branch re-aggregates by period with
    *    site='ALL' — summing amount AND the already-cumulative ytm_amount
    *    (pandas groupby().sum() sums every numeric column);
    *  - output columns (bo, site, amount, ytm_amount, period_start, unit,
    *    last_update_time) with unit='度'.
    *
    * @param electricityOrigin raw.electricity_total_decarb slice:
    *                          (site, amount, period_start, type)
    * @param renewSolar        raw.renewable_energy_decarb 光伏 slice:
    *                          (site, amount, period_start)
    * @param boundarySites     distinct boundary sites of raw.plant_mapping:
    *                          (site)
    */
  def electricityDecarb(electricityOrigin: DataFrame, renewSolar: DataFrame,
                        boundarySites: DataFrame, clock: Clock): DataFrame = {
    val origin = electricityOrigin
      .na.fill(0.0, Seq("amount"))
      .withColumnRenamed("amount", "amount_x")
    val solar = renewSolar
      .withColumn("type", lit("CSR"))
      .withColumnRenamed("amount", "amount_y")

    val joined = origin
      .join(broadcast(solar), Seq("site", "period_start", "type"), "left")
      .na.fill(0.0, Seq("amount_y"))
      .withColumn("amount", col("amount_x") + col("amount_y"))
      .select(col("site"), col("amount"), col("period_start"))

    // The reference cumsums in pandas row order, which leaves the running
    // total of same-(site, period) rows load-order-dependent. A distributed
    // engine needs a total order: tiebreak by amount so the result is
    // deterministic under any partitioning.
    val w = Window
      .partitionBy(year(col("period_start")), col("site"))
      .orderBy(col("period_start"), col("amount"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ytm = joined.withColumn("ytm_amount", sum(col("amount")).over(w))

    val rolled = calBoSite(ytm, boundarySites, extraKeys = Nil)

    rolled
      .select(col("bo"), col("site"), col("amount"), col("ytm_amount"),
        col("period_start"))
      .withColumn("unit", lit("度"))
      .withColumn("last_update_time",
        lit(java.sql.Timestamp.valueOf(clock.today.atStartOfDay())))
  }

  /** Port of `cal_bo_site` (reference: jobs/raw_to_staging.py:14-59) for any
    * extra category keys (category=0 → none, category=1 → Seq("category"),
    * category=2 → Seq("category1","category2")). */
  def calBoSite(data: DataFrame, boundarySites: DataFrame,
                extraKeys: Seq[String]): DataFrame = {
    val bounded = data
      .join(broadcast(boundarySites.select("site").distinct()), Seq("site"), "inner")
      .withColumn("bo", lit("ALL"))
    val groupKeys = (Seq("bo") ++ extraKeys :+ "period_start").map(col)
    val rollup = bounded
      .groupBy(groupKeys: _*)
      .agg(sum(col("amount")).as("amount"), sum(col("ytm_amount")).as("ytm_amount"))
      .withColumn("site", lit("ALL"))
    bounded.select(rollup.columns.map(col): _*).unionByName(rollup)
  }

  /** staging.renewable_energy_decarb (reference: jobs/raw_to_staging.py:
    * 982-1034): decode 光伏/綠證/綠電 to english categories, normalize the
    * WKS-P6* site renames, YTM per (year, site, category), cal_bo_site with
    * one category key. */
  def renewableEnergyDecarb(renewableEnergy: DataFrame, boundarySites: DataFrame,
                            clock: Clock): DataFrame = {
    import graft.operators.Relational.decode
    val decoded = renewableEnergy
      .withColumn("category", decode(col("category"),
        Map("光伏" -> "solar_energy", "綠證" -> "green_energy",
          "綠電" -> "green_electricity"), col("category")))
      .withColumn("site", decode(col("site"),
        Map("WKS-P6A" -> "WKS-6A", "WKS-P6B" -> "WKS-6B", "WKS-P6" -> "WKS-6"),
        col("site")))
      .na.fill(0.0, Seq("amount"))
    val w = Window
      .partitionBy(year(col("period_start")), col("site"), col("category"))
      .orderBy(col("period_start"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ytm = decoded.withColumn("ytm_amount", sum(col("amount")).over(w))
    calBoSite(ytm, boundarySites, extraKeys = Seq("category"))
      .select(col("bo"), col("site"), col("category"), col("amount"),
        col("ytm_amount"), col("period_start"))
      .withColumn("unit", lit("度"))
      .withColumn("last_update_time",
        lit(java.sql.Timestamp.valueOf(clock.today.atStartOfDay())))
  }
}
