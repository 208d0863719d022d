package graft.jobs

import java.sql.Timestamp
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.{Clock, DecarbDate}
import graft.operators.Relational.decode

/** Serving-layer transforms (reference: jobs/staging_to_app.py): the three
  * app tables green_elec_transfer_account (:47-397), solar_energy_overview
  * (:399-587) and green_elect_overview (:770-1059), plus the tariff
  * machinery they share — pick each area's applicable rule set, join bills
  * to it, and split summer/non-summer pricing by whether the billing period
  * falls inside the rule's seasonal window (reference :100-140).
  *
  * All transforms are I/O-free and period-polymorphic: the reference loops
  * the last 12 months one month at a time (:1081-1085, 12 DELETE+INSERT
  * round-trips per table); here [[last12MonthsSlice]] + one
  * dynamic-partition overwrite refresh the same window in a single plan.
  *
  * pandas semantics preserved deliberately:
  *  - `groupby` drops rows with a null group key → [[pandasGroupSum]];
  *  - `x != 0` keeps NaN rows (first filter) but a later `fillna(0)` +
  *    re-filter kills them — both filters are ported literally;
  *  - whole-frame `fillna(0)` also stuffs integer 0 into object columns
  *    (provider) — ported as a "0" string fill.
  */
object StagingToApp {

  /** pandas `groupby(keys).sum()`: rows with any null key silently drop. */
  private def pandasGroupSum(df: DataFrame, keys: Seq[String],
                             sums: Seq[String]): DataFrame = {
    val aggs = sums.map(c => sum(col(c)).as(c))
    df.na.drop(keys).groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Applicable tariff rule per area (reference :111-113, the
    * `groupby(area).apply(idxmax if max < now else idxmin)` quirk): take the
    * latest rule when every rule predates `now`, otherwise the earliest —
    * expressed as one window pass (conditional sort direction via a
    * per-area max), no groupby-apply. */
  def applicableTariff(rules: DataFrame, now: Timestamp): DataFrame = {
    val wArea = Window.partitionBy(col("area"))
    val withMax = rules.withColumn("__max_gd", max(col("guideline_date")).over(wArea))
    val pick = Window.partitionBy(col("area")).orderBy(
      when(col("__max_gd") < lit(now), col("guideline_date").cast("long") * -1)
        .otherwise(col("guideline_date").cast("long")).asc,
      col("base_id").asc)
    withMax.withColumn("__rn", row_number().over(pick))
      .filter(col("__rn") === 1)
      .drop("__max_gd", "__rn")
  }

  /** Seasonal tariff split (reference :132-140): a bill row keeps the summer
    * price exactly when its period falls inside [start_date, end_date] and
    * the row is the summer tariff — i.e. the two filter+append branches are
    * the single predicate `in_window == is_summer` (branches are disjoint,
    * so the union equals the filter). */
  def seasonalSplit(priced: DataFrame): DataFrame =
    priced.filter(
      col("period_start").between(col("start_date"), col("end_date"))
        === col("is_summer"))
      .dropDuplicates()

  /** The reference's per-month serving refresh loop collapsed to one slice:
    * filter the window transform to the rolling 12 months and overwrite the
    * partitions in one write (reference: jobs/staging_to_app.py:1081-1085). */
  def last12MonthsSlice(df: DataFrame, clock: Clock): DataFrame = {
    val (start, end) = DecarbDate.rollingMonths(clock, 12)
    df.filter(col("period_start").between(
      lit(java.sql.Date.valueOf(start)), lit(java.sql.Date.valueOf(end))))
  }

  private val accountKeys =
    Seq("site", "plant", "meter_code", "provider_name", "period_start")

  /** app.green_elec_transfer_account (reference: jobs/staging_to_app.py:
    * 47-397): the green-power reconciliation table. From the staging bill
    * slices it derives nine row families — the transfer volumes (轉供), the
    * billed grey consumption (計費), per-meter grey tariff prices via the
    * applicable-rule + seasonal-split machinery, grey totals and bills,
    * green totals (with the WLT/WTN/WIHK-2 總綠電度數 double-count fix) and
    * green bills (contract-priced), and three green-rate ratio families —
    * then unions them, recodes the Chinese categories, attaches
    * area/meter-group rollups (packaged-meter green rates), and re-derives
    * the WHC_ALL/WNH_ALL green rates on the fixed category.
    *
    * @param greenElectVol   staging.green_elect_vol slice: (site, plant,
    *                        meter_code, provider_name, category1, category2,
    *                        amount, period_start)
    * @param greenElectPrice staging.green_elect_price slice (same shape)
    * @param meterMapping    app.decarb_ww_site_elec_meter:
    *                        (meter_code, elect_type)
    * @param billMeter       app.elec_bill_meter:
    *                        (category2, price, elect_type, is_summer, base_id)
    * @param billBase        app.elec_bill_base: (base_id, area, guideline_date)
    * @param billSummer      app.elec_bill_summer:
    *                        (elect_type, start_date, end_date, base_id)
    * @param greenContract   app.green_elec_pre_contracts of the year with
    *                        光電-only types: (provider_name, contract_price)
    * @param areaMapping     app.decarb_ww_site_elec_meter: (area, meter_code)
    * @param meterGroup      app.decarb_ww_meter_group: (meter_code, group_id)
    * @param meterGroupNames app.decarb_ww_meter_group_mapping:
    *                        (group_id, group_name)
    */
  def greenElecTransferAccount(
      greenElectVol: DataFrame, greenElectPrice: DataFrame,
      meterMapping: DataFrame, billMeter: DataFrame, billBase: DataFrame,
      billSummer: DataFrame, greenContract: DataFrame, areaMapping: DataFrame,
      meterGroup: DataFrame, meterGroupNames: DataFrame,
      periodStart: java.time.LocalDate, now: Timestamp,
      clock: Clock): DataFrame = {
    val category2Dict = Map(
      "夏日週六離峰" -> "離峰", "夏日平日離峰" -> "離峰", "夏日假日離峰" -> "離峰",
      "夏日平日尖峰" -> "經常尖峰", "非夏日平日離峰" -> "離峰", "非夏日週六離峰" -> "離峰",
      "非夏日假日離峰" -> "離峰", "非夏日平日尖峰" -> "經常尖峰", "夏日平日半尖峰" -> "半尖峰",
      "夏日周六半尖峰" -> "週六半尖峰", "非夏日平日半尖峰" -> "半尖峰",
      "非夏日周六半尖峰" -> "週六半尖峰", "夏日週六半尖峰" -> "週六半尖峰",
      "非夏日週六半尖峰" -> "週六半尖峰", "尖峰" -> "經常尖峰", "周六半尖峰" -> "週六半尖峰")
    val accountCols = (accountKeys ++ Seq("category1", "category2", "amount")).map(col)

    def rateOf(left: DataFrame, right: DataFrame, keys: Seq[String]): DataFrame =
      left.withColumnRenamed("amount", "amount_x")
        .join(right.withColumnRenamed("amount", "amount_y")
          .select((keys :+ "amount_y").map(col): _*), keys, "left")
        .withColumn("amount", col("amount_x") / col("amount_y"))
        .withColumn("category1", lit("green_rate"))

    // 轉供度占比: per-row green rate of vol over billed amount
    val greenRate = rateOf(greenElectVol, greenElectPrice,
      accountKeys.filterNot(_ == "provider_name") ++
        Seq("provider_name", "category2"))
      .select(accountCols: _*)

    // applicable tariff rules + seasonal price split
    val applicableBase = applicableTariff(
      billBase.filter(col("guideline_date") <=
        lit(java.sql.Date.valueOf(periodStart))), now)
    val meterInfo = billSummer
      .join(applicableBase, Seq("base_id"), "inner")
      .join(billMeter, Seq("base_id", "elect_type"), "left")
      .withColumn("category2", decode(col("category2"), category2Dict, col("category2")))
    val pricedBills = greenElectPrice
      .join(broadcast(meterMapping), Seq("meter_code"), "left")
    val greyPriced = seasonalSplit(
      pricedBills.join(broadcast(meterInfo), Seq("elect_type", "category2"), "left"))

    val greyElectPrice = greyPriced
      .select(col("site"), col("plant"), col("meter_code"), col("provider_name"),
        col("category2"), col("period_start"), col("price").as("amount"))
      .withColumn("category1", lit("grey_elect_price"))
      .select(accountCols: _*)

    val greyElect = pricedBills.select(accountCols: _*)

    val electTotal = pandasGroupSum(
        pricedBills.select((accountKeys :+ "amount").map(col): _*),
        accountKeys, Seq("amount"))
      .withColumn("category1", lit("grey_elect"))
      .withColumn("category2", lit("elect_total"))

    val electBill = pandasGroupSum(
        greyPriced.withColumn("amount", col("amount") * col("price"))
          .select((accountKeys :+ "amount").map(col): _*),
        accountKeys, Seq("amount"))
      .withColumn("category1", lit("grey_elect"))
      .withColumn("category2", lit("elect_bill"))

    // 總綠電度數 double-count fix (reference :199-202): at the ALL-plant
    // grain keep only WLT/WTN/WIHK-2 sites; at plant grain only those plants
    val volFixed = greenElectVol.filter(
      (col("category2") === "總綠電度數" && col("plant") === "ALL" &&
        col("site").isin("WLT", "WTN", "WIHK-2")) ||
      (col("category2") === "總綠電度數" &&
        col("plant").isin("WLT", "WTN", "WIHK-2")) ||
      col("category2") =!= "總綠電度數")
    val greenElectTotal = pandasGroupSum(
        volFixed.select((accountKeys :+ "amount").map(col): _*),
        accountKeys, Seq("amount"))
      .withColumn("category1", lit("green_elect_vol"))
      .withColumn("category2", lit("elect_total"))

    val greenElectBill = pandasGroupSum(
        greenElectVol.join(broadcast(greenContract), Seq("provider_name"), "left")
          .withColumn("amount", col("amount") * col("contract_price"))
          .select((accountKeys :+ "amount").map(col): _*),
        accountKeys, Seq("amount"))
      .withColumn("category1", lit("green_elect_vol"))
      .withColumn("category2", lit("elect_bill"))

    // 總用電轉供度占比: green totals over grey totals
    val totalGreenRate = rateOf(greenElectTotal, electTotal,
        accountKeys :+ "category2")
      .select(accountCols: _*)

    val account = Seq(greenElectVol.select(accountCols: _*),
        greenElectBill.select(accountCols: _*),
        greenElectTotal.select(accountCols: _*), greyElectPrice,
        electTotal.select(accountCols: _*), electBill.select(accountCols: _*),
        greyElect, greenRate, totalGreenRate)
      .reduce(_ unionByName _)
      .withColumn("category1", decode(col("category1"),
        Map("計費" -> "grey_elect", "轉供" -> "green_elect_vol"), col("category1")))
      .withColumn("category2", decode(col("category2"),
        Map("離峰" -> "off_peak", "週六半尖峰" -> "sat_half_rush_peak",
          "經常尖峰" -> "peak", "半尖峰" -> "half_peak"), col("category2")))
      .withColumn("year", year(col("period_start")).cast("int"))
      .withColumn("month", month(col("period_start")).cast("int"))
      .drop("period_start")
      .join(broadcast(areaMapping), Seq("meter_code"), "left")

    // packaged-meter (打包電保) rollups: group meters into named bundles
    val groupDict = meterGroup.na.drop()
      .withColumn("group_id", col("group_id").cast("int"))
      .join(broadcast(meterGroupNames
        .withColumn("group_id", col("group_id").cast("int"))),
        Seq("group_id"), "left")
    val groupKeys = Seq("site", "plant", "provider_name", "category1",
      "category2", "year", "month", "area", "group_name")
    val grouped = pandasGroupSum(
        account.join(groupDict, Seq("meter_code"), "inner")
          .filter(col("category1").isin("green_elect_vol", "grey_elect"))
          .select((groupKeys :+ "amount").map(col): _*),
        groupKeys, Seq("amount"))
      .withColumnRenamed("group_name", "meter_code")

    val rateKeys = Seq("site", "plant", "provider_name", "category2",
      "year", "month", "area", "meter_code")
    val groupNoBill = grouped.filter(col("category2") =!= "elect_bill")
    val groupRate = rateOf(
        groupNoBill.filter(col("category1") === "green_elect_vol"),
        groupNoBill.filter(col("category1") === "grey_elect"), rateKeys)
      .select((rateKeys ++ Seq("category1", "amount")).map(col): _*)
      .na.drop() // reference :339 dropna(): unmatched grey side drops the row

    val finalAll = account
      .unionByName(grouped, allowMissingColumns = true)
      .unionByName(groupRate, allowMissingColumns = true)

    // WHC_ALL/WNH_ALL: re-derive green rates on the recoded category
    val wnhc = finalAll.filter(col("meter_code").isin("WHC_ALL", "WNH_ALL"))
      .withColumn("category2", decode(col("category2"),
        Map("總綠電度數" -> "elect_total"), col("category2")))
      .withColumn("area", lit("台灣"))
    val wnhcKeys = Seq("site", "plant", "meter_code", "provider_name",
      "category2", "year", "month", "area")
    val wnhcRate = rateOf(
        wnhc.filter(col("category1") === "green_elect_vol"),
        wnhc.filter(col("category1") === "grey_elect"), wnhcKeys)
      .select((wnhcKeys ++ Seq("category1", "amount")).map(col): _*)
    val wnhcFinal = wnhc.filter(col("category1") =!= "green_rate")
      .unionByName(wnhcRate, allowMissingColumns = true)

    finalAll.filter(!col("meter_code").isin("WHC_ALL", "WNH_ALL"))
      .unionByName(wnhcFinal)
      .withColumn("last_update_time",
        lit(Timestamp.valueOf(clock.today.atStartOfDay())))
  }

  /** app.solar_energy_overview (reference: jobs/staging_to_app.py:399-587):
    * the solar serving rollup. actual = actual_use + remain (the 11/22
    * source change: ESGI reports post-remain consumption), the six staging
    * families unioned, per-plant solar/total ratios for non-WZS/WKS sites,
    * site-grain rollups + ratios for WZS/WKS (plant='ALL'), everything
    * filtered back to the plants present in the staging union.
    *
    * All inputs are period slices with columns (site, plant[, category],
    * amount, ytm_amount, period_start).
    */
  def solarEnergyOverview(
      solarStg: DataFrame, solarRemainStg: DataFrame, solarInfoStg: DataFrame,
      solarOtherStg: DataFrame, electTotalStg: DataFrame,
      clock: Clock): DataFrame = {
    val cols = Seq("site", "plant", "category", "amount", "ytm_amount",
      "period_start").map(col)
    val actualUse = solarStg.filter(col("category") === "actual")
      .withColumn("category", lit("actual_use"))
    val target = solarStg.filter(col("category") === "target").select(cols: _*)
    val remain = solarRemainStg.withColumn("category", lit("remain"))
      .na.fill(0.0, Seq("amount", "ytm_amount"))
      .select(cols: _*)
    val actual = actualUse
      .withColumnRenamed("amount", "amount_x")
      .withColumnRenamed("ytm_amount", "ytm_amount_x")
      .join(remain.select(col("site"), col("plant"), col("period_start"),
        col("amount").as("amount_y"), col("ytm_amount").as("ytm_amount_y")),
        Seq("site", "plant", "period_start"), "left")
      .na.fill(0.0, Seq("amount_x", "amount_y", "ytm_amount_x", "ytm_amount_y"))
      .withColumn("amount", col("amount_x") + col("amount_y"))
      .withColumn("ytm_amount", col("ytm_amount_x") + col("ytm_amount_y"))
      .withColumn("category", lit("actual"))
      .select(cols: _*)
    val overview = Seq(actual, target, remain, actualUse.select(cols: _*),
      solarInfoStg.select(cols: _*), solarOtherStg.select(cols: _*))
      .reduce(_ unionByName _)
    val plantList = overview.select("plant").distinct()

    val electDict = Map("actual" -> "elect_total_actual",
      "target" -> "elect_total_target")
    val ratioDict = Map("actual" -> "solar_ratio_actual",
      "target" -> "solar_ratio_target")

    val solarElect = overview.filter(col("category").isin("actual", "target"))
    val solarWzks = solarElect.filter(col("site").isin("WKS", "WZS"))
    val solarRest = solarElect.filter(!col("site").isin("WKS", "WZS"))
    val electWzks = electTotalStg.filter(col("site").isin("WZS", "WKS"))
    val electRest = electTotalStg.filter(!col("site").isin("WZS", "WKS", "WIHK"))

    def pctRatio(left: DataFrame, right: DataFrame, keys: Seq[String]): DataFrame =
      left.withColumnRenamed("amount", "amount_x")
        .withColumnRenamed("ytm_amount", "ytm_amount_x")
        .join(right.select((keys ++ Seq("amount", "ytm_amount")).map(col): _*)
          .withColumnRenamed("amount", "amount_y")
          .withColumnRenamed("ytm_amount", "ytm_amount_y"), keys, "left")
        .na.fill(0.0, Seq("amount_x", "amount_y", "ytm_amount_x", "ytm_amount_y"))
        .withColumn("amount", col("amount_x") / col("amount_y") * 100)
        .withColumn("ytm_amount", col("ytm_amount_x") / col("ytm_amount_y") * 100)
        .withColumn("category", decode(col("category"), ratioDict, col("category")))

    val solarRatio = pctRatio(solarRest, electRest,
      Seq("site", "plant", "period_start", "category")).select(cols: _*)

    val solarWzksSite = pandasGroupSum(solarWzks,
      Seq("site", "category", "period_start"), Seq("amount", "ytm_amount"))
    val electWzksSite = pandasGroupSum(
      electWzks.select(col("site"), col("category"), col("period_start"),
        col("amount"), col("ytm_amount")),
      Seq("site", "category", "period_start"), Seq("amount", "ytm_amount"))
    val ratioWzks = pctRatio(solarWzksSite, electWzksSite,
        Seq("site", "period_start", "category"))
      .withColumn("plant", lit("ALL"))
      .select(cols: _*)

    val electRestDecoded = electRest
      .withColumn("category", decode(col("category"), electDict, col("category")))
      .select(cols: _*)
    val electWzksDecoded = electWzksSite
      .withColumn("category", decode(col("category"), electDict, col("category")))
      .withColumn("plant", lit("ALL"))
      .select(cols: _*)

    overview
      .unionByName(electRestDecoded).unionByName(solarRatio)
      .unionByName(electWzksDecoded).unionByName(ratioWzks)
      .join(plantList, Seq("plant"), "left_semi")
      .withColumn("last_update_time",
        lit(Timestamp.valueOf(clock.today.atStartOfDay())))
  }

  /** app.green_elect_overview (reference: jobs/staging_to_app.py:770-1059,
    * active branch): the green-power dashboard row per site — monthly/YTM
    * transfer targets (provider_plant_list), total-consumption targets
    * (elect_total with the WZS/WKS/WIHK site rollup), actuals
    * (electricity_decarb bo='ALL'), green actuals (renewable_energy_decarb
    * green_electricity), annual targets (provider list year sum + the
    * latest validated decarb_elect_simulate version), price-diff/carbon
    * coefficients and the unit-decarb-cost ratios.
    *
    * pandas quirks ported literally: the outer-join `actual_ytm != 0`
    * filter keeps nulls, but after `fillna(0)` the second filter kills
    * them; the whole-frame fillna(0) writes "0" into the provider string
    * column of unmatched rows.
    */
  def greenElectOverview(
      providerTarget: DataFrame, electTotalTarget: DataFrame,
      electActual: DataFrame, greenVolActual: DataFrame,
      yearTargetRaw: DataFrame, yearTargetAllRaw: DataFrame,
      greenPriceRaw: DataFrame, coefRaw: DataFrame, areaMapping: DataFrame,
      periodStart: java.time.LocalDate, clock: Clock): DataFrame = {
    val siteReplace = Map("WIHK1" -> "WIHK", "WIHK2" -> "WIHK",
      "WIHK-1" -> "WIHK", "WIHK-2" -> "WIHK", "WMIP1" -> "WMI",
      "WMIP2" -> "WMI", "WMYP1" -> "WMY")
    val period = lit(java.sql.Date.valueOf(periodStart))

    // target-all: per-site slice + WZS/WKS/WIHK site rollup
    val electSiteSlice = electTotalTarget
      .filter(!col("site").isin("WZS", "WKS", "WIHK"))
      .select(col("site"), col("amount").as("target_all"),
        col("ytm_amount").as("target_ytm_all"), col("period_start"))
    val electWzksRolled = pandasGroupSum(
        electTotalTarget.filter(col("site").isin("WZS", "WKS", "WIHK"))
          .select(col("site"), col("amount").as("target_all"),
            col("ytm_amount").as("target_ytm_all"), col("period_start")),
        Seq("site", "period_start"), Seq("target_all", "target_ytm_all"))
    val electTarget = electSiteSlice.unionByName(electWzksRolled)

    val targets = providerTarget.select(col("site"),
      col("amount").as("target"), col("ytm_amount").as("target_ytm"),
      col("period_start"))
    val actuals = electActual.select(col("site"),
      col("amount").as("actual_all"), col("ytm_amount").as("actual_ytm_all"),
      col("period_start"))
    val greens = greenVolActual.select(col("site"),
      col("amount").as("actual"), col("ytm_amount").as("actual_ytm"),
      col("period_start"))
    val df1Raw = targets
      .join(electTarget, Seq("site", "period_start"), "outer")
      .join(actuals, Seq("site", "period_start"), "outer")
      .join(greens, Seq("site", "period_start"), "outer")
    val df1Site = df1Raw.select(col("site"), col("period_start"),
      col("target"), col("target_ytm"), col("actual"), col("actual_ytm"))
    val df1All = pandasGroupSum(
      df1Raw.select(col("period_start"), col("target_all"),
        col("target_ytm_all"), col("actual_all"), col("actual_ytm_all"))
        .na.fill(0.0),
      Seq("period_start"),
      Seq("target_all", "target_ytm_all", "actual_all", "actual_ytm_all"))
    val df1 = df1Site.join(df1All, Seq("period_start"), "left").na.fill(0.0)

    // annual targets pinned to the reporting period
    val yearTarget = pandasGroupSum(
        yearTargetRaw.select(col("site"), col("provider"),
          col("amount").as("year_target")),
        Seq("site", "provider"), Seq("year_target"))
      .withColumn("period_start", period)
    val yearTargetAll = pandasGroupSum(
        yearTargetAllRaw.select(col("amount").as("year_target_all"))
          .withColumn("period_start", period),
        Seq("period_start"), Seq("year_target_all"))
    val df3 = yearTarget.join(yearTargetAll, Seq("period_start"), "left")

    val greenElect = df1.join(df3, Seq("site", "period_start"), "outer")
      // pandas NaN != 0 is True: nulls SURVIVE this first filter
      .filter(col("actual_ytm").isNull || col("actual_ytm") =!= 0)

    val greenPrice = greenPriceRaw
      .withColumn("site", decode(col("site"), siteReplace, col("site")))
      .select(col("site"), col("amount").as("price_diff"),
        col("amount").as("price_diff_ytm"))
      .dropDuplicates()
    val coef = coefRaw
      .withColumn("site", decode(col("site"), siteReplace, col("site")))
      .select(col("site"), col("amount").as("coef"))
      .dropDuplicates()
    val priceCoef = greenPrice.join(broadcast(coef), Seq("site"), "left")

    val numericCols = Seq("target", "target_ytm", "target_all",
      "target_ytm_all", "actual", "actual_ytm", "actual_all",
      "actual_ytm_all", "year_target", "year_target_all", "price_diff",
      "price_diff_ytm", "coef")
    val filled = greenElect.join(priceCoef, Seq("site"), "left")
      .na.fill(0.0, numericCols)
      .na.fill("0", Seq("provider")) // pandas fillna(0) on the object column
      .withColumn("unit",
        (col("actual") / 1000 * col("coef")) /
          (col("actual") / 1000 * col("price_diff")))
      .withColumn("unit_ytm",
        (col("actual_ytm") / 1000 * col("coef")) /
          (col("actual_ytm") / 1000 * col("price_diff_ytm")))

    filled.join(broadcast(areaMapping.select("site", "area").distinct()),
        Seq("site"), "left")
      .withColumn("year", year(col("period_start")).cast("int"))
      .withColumn("month", month(col("period_start")).cast("int"))
      .select(col("site"), col("year"), col("month"), col("target"),
        col("target_ytm"), col("target_all"), col("target_ytm_all"),
        col("actual_all"), col("actual_ytm_all"), col("actual"),
        col("actual_ytm"), col("year_target"), col("year_target_all"),
        col("price_diff"), col("price_diff_ytm"), col("unit"),
        col("unit_ytm"), col("area"), col("provider"))
      .na.drop(Seq("area"))
      .filter(col("actual_ytm") =!= 0) // second filter: post-fill zeros die
      .withColumn("last_update_time",
        lit(Timestamp.valueOf(clock.today.atStartOfDay())))
  }
}
