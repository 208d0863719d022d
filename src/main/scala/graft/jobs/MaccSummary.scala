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

  import graft.operators.Relational.decode

  /** Steps 1-5 (reference: macc_summary/macc_input_to_summary.py:26-156):
    * the energy_demand frame assembly.
    *
    *  1. keep the numerically-highest 'V&lt;n&gt;' simulation version;
    *  2. existing solar: 2024 target generation, with the shared WKS/XTRKS
    *     plant split by the two sites' simulated 2024 demand ratio; 2025+
    *     rolls up under XTRKS (and — reference quirk kept — WITHOUT the
    *     category filter, so actual+target sum together there);
    *  3. source shares: PPA% from the renewable settings (five sites have
    *     no PPA), REC% is the remainder clipped at zero, PPA% recomputed
    *     off the clipped REC. The reference's per-site REC-zero writes at
    *     :93-103 are dead code — REC_rate is recomputed wholesale at :106 —
    *     and are not ported;
    *  4. kWh demands from the shares;
    *  5. abatement tonnage via the carbon coefficient (WIH's coefficient
    *     copied onto the Taiwan sites N2/WKH/WTN/竹北AI, WIHK1/WIHK2/WMYP1
    *     site spellings normalized).
    *
    * @param energyDemandRaw  app.decarb_elect_simulate:
    *                         (site, year, amount, version 'V&lt;n&gt;')
    * @param rawSolar         raw.solar: (plant, category, amount, period_start)
    * @param renewableSetting staging.renewable_setting (year, category, amount)
    * @param carbonCoef       staging.decarb_carbon_coef (site, year, amount)
    */
  def assembleDemand(energyDemandRaw: DataFrame, rawSolar: DataFrame,
                     renewableSetting: DataFrame,
                     carbonCoef: DataFrame): DataFrame = {
    // Step 1 — numeric max of the 'V<n>' version strings
    val vnum = expr("try_cast(substring(version, 2) AS int)")
    val maxV = energyDemandRaw.select(max(vnum).as("__maxv"))
    val demand = energyDemandRaw.crossJoin(broadcast(maxV))
      .filter(vnum === col("__maxv")).drop("__maxv")
      .select(col("site"), col("year"), col("amount"))

    // Step 2 — the WKS:XTRKS 2024 split ratio comes from the demand itself
    val wks = demand.filter(col("year") === 2024 && col("site") === "WKS")
      .select(col("amount").as("__wks"))
    val xtrks = demand.filter(col("year") === 2024 && col("site") === "XTRKS")
      .select(col("amount").as("__xtrks"))
    val ratio = wks.crossJoin(xtrks)
      .select((col("__wks") / (col("__wks") + col("__xtrks"))).as("__wks_ratio"))

    val solarYear = rawSolar.withColumn("year", year(col("period_start")))
    val solar2024 = solarYear
      .filter(col("category") === "target" && col("year") === 2024)
      .groupBy(col("plant"), col("year")).agg(sum(col("amount")).as("amount"))
    val sharedPair = solar2024.filter(col("plant") === "WKS/XTRKS")
      .crossJoin(broadcast(ratio))
    val wks2024 = sharedPair.select(lit("WKS").as("plant"), col("year"),
      (col("amount") * col("__wks_ratio")).as("amount"))
    val xtrks2024 = sharedPair.select(lit("XTRKS").as("plant"), col("year"),
      (col("amount") * (lit(1) - col("__wks_ratio"))).as("amount"))
    val solarLater = solarYear.filter(col("year") >= 2025)
      .groupBy(col("plant"), col("year")).agg(sum(col("amount")).as("amount"))
      .withColumn("plant",
        when(col("plant") === "WKS/XTRKS", "XTRKS").otherwise(col("plant")))
    val solarAll = solar2024.select("plant", "year", "amount")
      .unionByName(wks2024).unionByName(xtrks2024).unionByName(solarLater)
      .select(col("plant").as("site"), col("year"),
        col("amount").as("solar_demand"))

    val withSolar = demand.join(solarAll, Seq("site", "year"), "left")
      .na.fill(0.0, Seq("solar_demand"))
      .withColumn("solar_rate", col("solar_demand") / col("amount") * 100)

    // Step 3 — shares; null PPA years propagate like the reference's NaN
    val ppa = renewableSetting.filter(col("category") === "PPA")
      .select(col("year"), col("amount").as("PPA_rate"))
    val rates = withSolar.join(broadcast(ppa), Seq("year"), "left")
      .withColumn("PPA_rate",
        when(col("site").isin("WCD", "WCQ", "WCZ", "WMX", "WVN"), 0.0)
          .otherwise(col("PPA_rate")))
      .withColumn("REC_rate", lit(100) - col("solar_rate") - col("PPA_rate"))
      .withColumn("REC_rate",
        when(col("REC_rate") < 0, 0.0).otherwise(col("REC_rate")))
      .withColumn("PPA_rate", lit(100) - col("solar_rate") - col("REC_rate"))
      // Step 4
      .withColumn("PPA_demand", col("amount") * col("PPA_rate") / 100)
      .withColumn("REC_demand", col("amount") * col("REC_rate") / 100)

    // Step 5
    val coefBase = carbonCoef.select(col("site"), col("year"),
      col("amount").as("decarb_carbon_coef"))
    val coef = Seq("N2", "WKH", "WTN", "竹北AI")
      .map(s => coefBase.filter(col("site") === "WIH").withColumn("site", lit(s)))
      .foldLeft(coefBase)(_ unionByName _)
      .withColumn("site", decode(col("site"),
        Map("WIHK1" -> "WIHK-1", "WIHK2" -> "WIHK-2", "WMYP1" -> "WMY"),
        col("site")))
    rates.join(broadcast(coef), Seq("site", "year"), "left")
      .withColumn("PPA_abatement",
        col("PPA_demand") * col("decarb_carbon_coef") / 1000)
      .withColumn("REC_abatement",
        col("REC_demand") * col("decarb_carbon_coef") / 1000)
      .withColumn("target_abatement",
        col("amount") * col("decarb_carbon_coef") / 1000)
  }

  /** Step 6's input joins (reference :162-182): the certificate price and
    * the green-electricity price difference onto the demand frame, with
    * WIH's price copied to the Taiwan sites N2/竹北AI and duplicates
    * dropped. */
  def joinGreenCosts(demand: DataFrame, greenCerCost: DataFrame,
                     greenElectCost: DataFrame): DataFrame = {
    val certs = greenCerCost.select(col("site"), col("year"),
      col("amount").as("green_cer_electricity_cost"))
    val elecBase = greenElectCost.select(col("site"), col("year"),
      col("amount").as("green_electricity_diff"))
    val elec = Seq("N2", "竹北AI")
      .map(s => elecBase.filter(col("site") === "WIH").withColumn("site", lit(s)))
      .foldLeft(elecBase)(_ unionByName _)
      .dropDuplicates()
    demand.join(certs, Seq("site", "year"), "left")
      .join(elec, Seq("site", "year"), "left")
  }

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
