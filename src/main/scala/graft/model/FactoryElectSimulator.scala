package graft.model

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoders}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Financial

/** The factory-electricity forecast simulator, re-expressed Spark-first
  * (reference: Model/Factory_elect_simulator_update.py:672-1048 — a 14-step
  * pandas script). The distributed pipeline keeps the same stages:
  *
  *   history → per-group trend rates (CAGR aggregator) → forward simulation
  *   (year range cross join + compounding) → model scoring (per-plant batch
  *   calls behind a [[Scorer]] seam, the reference's REST POST at :813-830)
  *   → site disaggregation by ratio (share-of-group multiply, :309-312)
  *   → versioned output (:1039-1042).
  *
  * The external scoring endpoint is a trait so tests inject a deterministic
  * model, exactly like the reference's unit tests patch the HTTP seam
  * (reference: tests/jobs_source_to_raw_test.py:12-55).
  */
object FactoryElectSimulator {

  final case class FeatureRow(plant: String, year: Int, features: Map[String, Double])
  final case class ScoredRow(plant: String, year: Int, prediction: Double)

  /** One batch call per plant — the reference's per-plant POST fan-out. */
  trait Scorer extends Serializable {
    def scorePlant(plant: String, rows: Seq[FeatureRow]): Seq[ScoredRow]
  }

  /** Budget/actual variable feature prep (reference :30-70,
    * `variable_forecast_generator`): classify MOH account names into the
    * three model features (Headcount → member_counts, Production →
    * product_qty, else shipment_qty), aggregate per plant-month, and pivot
    * wide. Unmapped plants (null bo) drop; WCD-1 folds into WCD.
    *
    * @param raw          raw.V_BUDGETMOH_ESG / V_ACTUALMOH_ESG:
    *                     (plant_code, accountnm, date_key, value)
    * @param plantMapping (plant_code, bo, site, plant_name)
    */
  def featurePrep(raw: DataFrame, plantMapping: DataFrame): DataFrame =
    raw.join(broadcast(plantMapping), Seq("plant_code"), "left")
      .filter(col("bo").isNotNull)
      .withColumn("account_name",
        when(col("accountnm").contains("Headcount"), "member_counts")
          .when(col("accountnm").contains("Production"), "product_qty")
          .otherwise("shipment_qty"))
      .groupBy(col("bo"), col("site"), col("plant_name"),
        col("date_key").as("datetime"))
      .pivot("account_name", Seq("member_counts", "product_qty", "shipment_qty"))
      .agg(sum(col("value")))
      .withColumn("plant_name",
        when(col("plant_name") === "WCD-1", "WCD").otherwise(col("plant_name")))

  /** Per-plant CAGR of yearly amounts (reference :205-222). */
  def trendRates(history: DataFrame): DataFrame =
    history.groupBy(col("plant"))
      .agg(Financial.cagrAgg(col("year"), col("amount")).as("rate"))

  /** Negative-rate quantile imputation (reference :220-233): a plant whose
    * trend came out negative gets the 25th percentile of the POSITIVE rates
    * instead — the reference's guard against simulating a shrinking plant
    * off one bad year. Spark's exact `percentile` linearly interpolates just
    * like np.quantile. */
  def imputeNegativeRates(rates: DataFrame,
                          rateCol: String = "rate"): DataFrame = {
    val q = rates.filter(col(rateCol) > 0)
      .agg(expr(s"percentile($rateCol, 0.25)").as("__q"))
    rates.crossJoin(broadcast(q))
      .withColumn(rateCol,
        when(col(rateCol) < 0, col("__q")).otherwise(col(rateCol)))
      .drop("__q")
  }

  /** History repair, copy-forward form (reference :237-248): a plant's
    * broken month is replaced by its previous month's rows re-dated (the
    * WOK 2022-12 ← 2022-11 fix). */
  def copyForwardRepair(df: DataFrame, plant: String,
                        from: java.sql.Date, to: java.sql.Date): DataFrame = {
    val moved = df.filter(col("plant") === plant && col("datetime") === from)
      .withColumn("datetime", lit(to))
    df.filter(!(col("plant") === plant && col("datetime") === to))
      .unionByName(moved)
  }

  /** History repair, prefer-new form (reference :375-383): merge corrected
    * values and keep the correction where present — the reference's
    * `np.where(new.isna(), old, new)` as a coalesce. */
  def backfillColumn(df: DataFrame, updates: DataFrame, keys: Seq[String],
                     valueCol: String): DataFrame =
    df.join(updates.select((keys.map(col) :+
        col(valueCol).as("__new")): _*), keys, "left")
      .withColumn(valueCol, coalesce(col("__new"), col(valueCol)))
      .drop("__new")

  /** Site code from a plant id (reference :585-586,616-617 plus the WIHK
    * exception at :509-510): the prefix before '-', except WIHK plants keep
    * their full id. */
  def siteFromPlant(plant: Column): Column = {
    val prefix = when(plant.contains("-"), split(plant, "-").getItem(0))
      .otherwise(plant)
    when(prefix === "WIHK", plant).otherwise(prefix)
  }

  /** Month-over-base growth of predicted electricity (reference :498-510):
    * every post-base-year month joins its same-calendar-month prediction in
    * the base window; the rate is the relative change, and the site code is
    * derived from the plant. */
  def monthGrowthVsBase(predictions: DataFrame, baseYear: Int,
                        baseStart: java.sql.Date,
                        baseEnd: java.sql.Date): DataFrame = {
    val base = predictions
      .filter(col("datetime").between(lit(baseStart), lit(baseEnd)))
      .select(col("month"), col("plant"),
        col("predict_electricity").as("predict_electricity_base"))
    predictions
      .filter(col("datetime") >= lit(baseStart) && col("year") > baseYear - 1)
      .join(base, Seq("month", "plant"), "left")
      .withColumn("month_grouth_rate",
        (col("predict_electricity") - col("predict_electricity_base")) /
          col("predict_electricity_base"))
      .withColumn("site", siteFromPlant(col("plant")))
  }

  /** The reference's shipment growth-rate clamps: outliers above 1000 reset
    * to 0.5 (:529), then ≥0.99 → 0.7, < −0.99 → −1, else halved
    * (:511-513). */
  def clampGrowthRate(gr: Column): Column =
    when(gr >= 0.99, 0.7).when(gr < -0.99, -1.0).otherwise(gr * 0.5)
  def resetOutlierGrowthRate(gr: Column): Column =
    when(gr > 1000, 0.5).otherwise(gr)

  /** Forward-simulate each plant from its latest year to `toYear` by
    * compounding its trend rate; a year-range cross join keeps the whole
    * simulation columnar (no driver loop over years). */
  def simulate(history: DataFrame, rates: DataFrame, toYear: Int): DataFrame = {
    val latest = history
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("plant")).orderBy(col("year").desc)))
      .filter(col("rn") === 1)
      .select(col("plant"), col("year").as("base_year"), col("amount").as("base_amount"))
    latest.join(rates, Seq("plant"), "left")
      .na.fill(0.0, Seq("rate"))
      .withColumn("year",
        explode(sequence(col("base_year") + 1, lit(toYear))))
      .withColumn("amount",
        col("base_amount") * pow(lit(1.0) + col("rate"), col("year") - col("base_year")))
      .select(col("plant"), col("year"), col("amount"))
  }

  /** Score features plant-at-a-time through the injected model: groupByKey on
    * plant keeps each batch on one executor (the reference's 18 per-plant
    * batches, :692-694), with no driver round-trip per row. */
  def scoreBatches(features: Dataset[FeatureRow], scorer: Scorer): Dataset[ScoredRow] = {
    implicit val enc = Encoders.product[ScoredRow]
    features.groupByKey(_.plant)(Encoders.STRING)
      .flatMapGroups((plant, it) => scorer.scorePlant(plant, it.toSeq).iterator)
  }

  /** Disaggregate plant totals onto sites by each site's share of the plant
    * ratio weight (reference :309-312, the fem_ratio share-of-group). */
  def disaggregateBySite(plantTotals: DataFrame, siteWeights: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("plant"))
    val shares = siteWeights.withColumn("share",
      when(sum(col("weight")).over(w) =!= 0.0,
        col("weight") / sum(col("weight")).over(w)))
    plantTotals.join(shares, Seq("plant"))
      .select(col("plant"), col("site"), col("year"),
        (col("amount") * col("share")).as("amount"))
  }

  /** Stamp a monotonically increasing version (reference :938-947 selects
    * MAX(version)+1; here the caller passes the next version). */
  def versioned(df: DataFrame, version: Int, validate: Boolean = false): DataFrame =
    df.withColumn("version", lit(version))
      .withColumn("validate", lit(validate))
}
