package graft.model

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
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

  /** Per-plant CAGR of yearly amounts (reference :205-222). */
  def trendRates(history: DataFrame): DataFrame =
    history.groupBy(col("plant"))
      .agg(Financial.cagrAgg(col("year"), col("amount")).as("rate"))

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
