package graft.jobs

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.Money

/** Marginal-abatement-cost (MACC) summary, steps 6-10 of the reference's
  * scope-2 pipeline (reference: macc_summary/macc_input_to_summary.py:
  * 175-283): FX-convert unit costs (RMB→USD, MWh→kWh /1000), multiply by
  * demand for yearly incremental cost, discount by the latest Bloomberg WACC
  * `cost/((1+wacc)^(year-2023))`, divide by abatement for the marginal cost
  * (zero abatement → null, the replace(0, nan) idiom), then unpivot the six
  * measures into the long (site, year, amount, category, lever, item) layout
  * and keep year > 2023 with nulls dropped.
  */
object MaccSummary {

  private val baseYear = 2023

  /** @param demand  (site, year, PPA_demand, REC_demand, PPA_abatement,
    *                REC_abatement, green_electricity_diff,
    *                green_cer_electricity_cost) — the reference's assembled
    *                energy_demand frame
    * @param fxRmbToUsd per-year (year, rate)
    * @param wacc       the latest WACC in percent (e.g. 5.637) */
  def summarize(demand: DataFrame, fxRmbToUsd: DataFrame, wacc: Double): DataFrame = {
    val w = lit(wacc * 0.01)
    val enriched = demand
      .join(broadcast(fxRmbToUsd.select(col("year"), col("rate"))), Seq("year"), "left")
      .withColumn("green_cer_usd_kwh",
        col("green_cer_electricity_cost") * col("rate") / 1000.0)
      .withColumn("green_usd_kwh",
        col("green_electricity_diff") * col("rate") / 1000.0)
      .withColumn("rec_year_cost", col("REC_demand") * col("green_cer_usd_kwh"))
      .withColumn("ppa_year_cost", col("PPA_demand") * col("green_usd_kwh"))
      .withColumn("wacc_green_cer_cost",
        col("rec_year_cost") / pow(w + 1.0, col("year") - baseYear))
      .withColumn("wacc_green_cost",
        col("ppa_year_cost") / pow(w + 1.0, col("year") - baseYear))
      .withColumn("wacc_green_cer_cost_margin",
        Money.safeDiv(col("wacc_green_cer_cost"), col("REC_abatement")))
      .withColumn("wacc_green_cost_margin",
        Money.safeDiv(col("wacc_green_cost"), col("PPA_abatement")))

    val measures = Seq(
      ("wacc_green_cost", "2.2 PPA", "減碳成本"),
      ("wacc_green_cer_cost", "2.3 Unbundled EAC", "減碳成本"),
      ("PPA_abatement", "2.2 PPA", "碳排減排量"),
      ("REC_abatement", "2.3 Unbundled EAC", "碳排減排量"),
      ("wacc_green_cost_margin", "2.2 PPA", "邊際減排成本"),
      ("wacc_green_cer_cost_margin", "2.3 Unbundled EAC", "邊際減排成本"))

    measures.map { case (measure, lever, item) =>
      enriched.select(col("site"), col("year"),
        col(measure).as("amount"),
        lit("Scope 2").as("category"), lit(lever).as("lever"), lit(item).as("item"))
    }.reduce(_ unionByName _)
      .filter(col("year") > baseYear)
      .na.drop(Seq("amount"))
  }
}
