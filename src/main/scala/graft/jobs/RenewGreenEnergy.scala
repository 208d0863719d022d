package graft.jobs

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.core.DecarbDate.QuarterWindow
import graft.operators.Relational.clipNonNeg

/** The quarterly green-energy overview job (reference:
  * jobs/renew_green_energy.py): assembles per-site renewable totals —
  * electricity, solar, green electricity, green certificates — against the
  * renewable-target rate, derives the remaining green-energy demand and its
  * predicted purchase cost, and rolls the result up per area.
  *
  * The reference loops one quarter window at a time
  * (`green_energy_overview` :67-104, with the Q1 branch reporting last
  * year's Q4 over the whole previous year); the windows come from
  * [[graft.core.DecarbDate.reportingQuarters]] and each window's transform
  * here is I/O-free and window-parameterized.
  */
object RenewGreenEnergy {

  /** Renewable target rate of a year: the solar+PPA+REC percentage points
    * over 100 (reference: jobs/renew_green_energy.py:128-129,201-202 —
    * a hand-written SQL aggregate, here a DataFrame-side one). */
  def renewTargetRate(renewableSetting: DataFrame, year: Int): DataFrame =
    renewableSetting
      .filter(col("year") === year &&
        col("category").isin("solar", "PPA", "REC"))
      .groupBy(col("year"))
      .agg((sum(col("amount")) / 100).as("target_rate"))

  /** `cal_renew_total` (reference: jobs/renew_green_energy.py:21-57): the
    * grey-electricity remainder and the green-energy demand after netting
    * solar, green electricity and certificates off the target, clipped at
    * zero.
    *
    * @param renewTarget (year, target_rate)
    * @param elect       (year, site, total_elect)
    * @param solar       (site, solar)
    * @param grelect     (site, green_elect)
    * @param grenergy    (site, green_energy)
    */
  def calRenewTotal(renewTarget: DataFrame, elect: DataFrame,
                    solar: DataFrame, grelect: DataFrame,
                    grenergy: DataFrame): DataFrame = {
    val target = elect.join(broadcast(renewTarget), Seq("year"), "left")
      .withColumn("target_renew", col("total_elect") * col("target_rate"))
      .select(col("site"), col("target_renew"))
    val grey = elect
      .join(solar, Seq("site"), "left")
      .join(grelect, Seq("site"), "left")
      .na.fill(0.0)
      .withColumn("grey_elect",
        col("total_elect") - col("solar") - col("green_elect"))
      .select(col("site"), col("year"), col("total_elect"), col("grey_elect"))
    val demand = target
      .join(solar, Seq("site"), "left")
      .join(grelect, Seq("site"), "left")
      .join(grenergy, Seq("site"), "left")
      .na.fill(0.0)
      .withColumn("green_energy_request",
        clipNonNeg(col("target_renew") - col("solar") - col("green_elect") -
          col("green_energy")))
    grey.join(demand, Seq("site"), "left").dropDuplicates()
  }

  /** Customer rows of app.green_energy_amount for a quarter — the slice
    * both branches read repeatedly (reference :115-124,218-228). */
  private def customerSlice(customerAmounts: DataFrame,
                            qw: QuarterWindow): DataFrame =
    customerAmounts.filter(col("quarter") === qw.quarterNum &&
      col("year") === qw.year && col("customer").isNotNull &&
      col("customer") =!= "ALL" && col("customer") =!= "")

  /** The `summarize_all_data` branch (reference:
    * jobs/renew_green_energy.py:193-348): staging YTM aggregates at the
    * quarter's closing month, minus the already-entered customer rows,
    * through [[calRenewTotal]], priced by the site-level green-purchase
    * rows, area-mapped (unmapped → 其他), then the per-area ALL rollup
    * (site='ALL', customer='ALL') unioned above the site rows. Customer
    * rows feed the rollup but are not re-emitted — they already live in
    * the serving table.
    *
    * @param renewableSetting  staging.renewable_setting (year, category, amount)
    * @param electricityDecarb staging.electricity_decarb
    *                          (bo, site, amount, ytm_amount, period_start)
    * @param renewableEnergy   staging.renewable_energy_decarb
    *                          (bo, site, category, amount, ytm_amount, period_start)
    * @param customerAmounts   app.green_energy_amount (customer grain)
    * @param greenPurchase     app.green_purchase
    *                          (year, site, quarter, customer, unit_price, amount)
    * @param areaMapping       staging.plant_mapping (year, site, area)
    */
  def summarizeQuarter(
      renewableSetting: DataFrame, electricityDecarb: DataFrame,
      renewableEnergy: DataFrame, customerAmounts: DataFrame,
      greenPurchase: DataFrame, areaMapping: DataFrame,
      qw: QuarterWindow): DataFrame = {
    val periodEnd = lit(java.sql.Date.valueOf(qw.periodEnd))
    val periodStart = lit(java.sql.Date.valueOf(qw.periodStart))
    def siteAgg(df: DataFrame, valueCol: String, as: String): DataFrame =
      df.filter(col("bo") === "ALL" && col("site") =!= "ALL")
        .groupBy(col("site")).agg(sum(col(valueCol)).as(as))

    val electSrc = siteAgg(
        electricityDecarb.filter(col("period_start") === periodEnd),
        "ytm_amount", "total_elect")
      .withColumn("year", lit(qw.year))
    def renewSrc(category: String, as: String, ytm: Boolean = true) =
      siteAgg(renewableEnergy.filter(col("category") === category &&
        col("period_start") === periodEnd), if (ytm) "ytm_amount" else "amount", as)
    val solarSrc = renewSrc("solar_energy", "solar")
    val grelectSrc = renewSrc("green_electricity", "green_elect")
    // certificates settle on in-window amounts, not the closing YTM
    val grenergy = siteAgg(
      renewableEnergy.filter(col("category") === "green_energy" &&
        col("period_start").between(periodStart, periodEnd)),
      "amount", "green_energy")

    val cust = customerSlice(customerAmounts, qw)
    def netOfCustomer(src: DataFrame, add: DataFrame, keys: Seq[String],
                      valueCol: String): DataFrame =
      src.withColumnRenamed(valueCol, "__x")
        .join(add.withColumnRenamed(valueCol, "__y"), keys, "left")
        .na.fill(0.0, Seq("__x", "__y"))
        .withColumn(valueCol, col("__x") - col("__y"))
        .select((keys :+ valueCol).map(col): _*)
    val elect = netOfCustomer(electSrc,
      cust.select("year", "site", "total_elect"), Seq("year", "site"), "total_elect")
    val solar = netOfCustomer(solarSrc,
      cust.select("site", "solar"), Seq("site"), "solar")
    val grelect = netOfCustomer(grelectSrc,
      cust.select("site", "green_elect"), Seq("site"), "green_elect")

    val renewTotal = calRenewTotal(
      renewTargetRate(renewableSetting, qw.year), elect, solar, grelect, grenergy)

    val unitPrice = greenPurchase
      .filter(col("customer") === "-" || col("customer").isNull)
      .filter(col("year") === qw.year && col("quarter") === qw.quarter)
      .select(col("year"), col("site"), col("quarter"), col("unit_price"),
        col("amount").as("actual_amount"))
    val priced = renewTotal.join(unitPrice, Seq("site", "year"), "left")
      .na.fill(0.0, Seq("unit_price", "actual_amount"))
      .withColumn("predict_price",
        col("unit_price") * col("green_energy_request"))
      .withColumn("ratio", col("green_energy") / col("total_elect") * 100)

    val area = priced
      .join(broadcast(areaMapping.filter(col("year") === qw.year)
        .select("year", "site", "area").dropDuplicates()),
        Seq("site", "year"), "left")
      .withColumn("quarter", lit(qw.quarterNum))
      .na.fill("其他", Seq("area"))

    val custAdd = cust.select(col("year"), col("quarter"), col("area"),
      col("site"), col("total_elect"), col("target_renew"), col("solar"),
      col("green_elect"), col("grey_elect"), col("green_energy"),
      col("predict_price"), col("green_energy_request"), col("actual_amount"))
    val combined = area.unionByName(custAdd, allowMissingColumns = true)
      .na.fill(0.0)

    val rollupCols = Seq("total_elect", "grey_elect", "target_renew", "solar",
      "green_elect", "green_energy", "green_energy_request", "unit_price",
      "predict_price", "actual_amount")
    val rolled = combined
      .groupBy(col("year"), col("quarter"), col("area"))
      .agg(rollupCols.map(c => sum(col(c)).as(c)).head,
        rollupCols.map(c => sum(col(c)).as(c)).tail: _*)
      .withColumn("site", lit("ALL"))
      .withColumn("customer", lit("ALL"))
      .withColumn("ratio", col("green_energy") / col("total_elect") * 100)

    val withRemark = rolled
      .unionByName(area.withColumn("customer", lit("")), allowMissingColumns = true)
      .join(customerAmounts
        .filter(col("year") === qw.year && col("quarter") === qw.quarterNum)
        .select("year", "quarter", "area", "site", "customer", "remark"),
        Seq("year", "quarter", "site", "area", "customer"), "left")
    withRemark
  }

  /** The `add_customer_data` branch (reference:
    * jobs/renew_green_energy.py:106-191): re-derive the customer-grain rows
    * from the already-entered customer amounts (certificates forced to 0),
    * priced by the per-customer green-purchase rows. */
  def addCustomerData(
      renewableSetting: DataFrame, customerAmounts: DataFrame,
      greenPurchase: DataFrame, qw: QuarterWindow): DataFrame = {
    val cust = customerSlice(customerAmounts, qw)
    val renewTotal = calRenewTotal(
      renewTargetRate(renewableSetting, qw.year),
      cust.select("year", "site", "total_elect"),
      cust.select("site", "solar"),
      cust.select("site", "green_elect"),
      cust.select("site", "green_energy").withColumn("green_energy", lit(0.0)))
    val withArea = renewTotal
      .join(cust.select("year", "quarter", "area", "site", "customer"),
        Seq("site", "year"), "left")
    val unitPrice = greenPurchase
      .filter(col("customer") =!= "-" && col("customer").isNotNull)
      .filter(col("year") === qw.year && col("quarter") === qw.quarter)
      .select(col("year"), col("site"), col("customer"), col("unit_price"),
        col("amount").as("actual_amount"))
    withArea.join(unitPrice, Seq("site", "year", "customer"), "left")
      .na.fill(0.0, Seq("unit_price"))
      .withColumn("predict_price",
        col("unit_price") * col("green_energy_request"))
      .withColumn("ratio", col("green_energy") / col("total_elect") * 100)
      .join(customerAmounts
        .filter(col("year") === qw.year && col("quarter") === qw.quarterNum)
        .select("year", "quarter", "area", "site", "customer", "remark"),
        Seq("year", "quarter", "site", "area", "customer"), "left")
  }
}
