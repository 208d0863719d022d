package graft.jobs

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.Relational

/** Decarbonization-path targets (reference: jobs/decarb_path_etl.py:11-112):
  * the latest simulated electricity per (site, year) × carbon coefficient ×
  * a per-category renewable-ratio slice /1000 → tonnes per year, for five
  * categories. The reference writes the same merge-multiply-group block five
  * times with a different ratio selector; here one fold over a declarative
  * ratio spec produces all five branches from a single shared base plan
  * (Catalyst reuses the joined base across branches).
  */
object DecarbPath {

  /** (category label, ratio source categories, complement?) — complement
    * means `1 − Σ ratio` (the grid-share remainder). */
  private val branches: Seq[(String, Seq[String], Boolean)] = Seq(
    ("Scope 1", Seq("PPA", "solar"), true), // location-based remainder
    ("Scope 2 (Scope 2-REC)", Seq("REC", "PPA", "solar"), true),
    ("RECs", Seq("REC"), false),
    ("Solar Power Generation", Seq("solar"), false),
    ("PPA", Seq("PPA"), false))

  private val scope1Factor = 0.06 / (1 - 0.06)

  /** @param elecSim (site, year, amount) — latest validated simulation
    * @param coef    (site, year, coef) — with site aliases already decoded
    * @param ratios  (year, category, ratio) in 0..1 */
  def decarbPath(elecSim: DataFrame, coef: DataFrame, ratios: DataFrame,
                 versionYear: Int): DataFrame = {
    val base = elecSim.join(broadcast(coef), Seq("site", "year"), "left")

    def emission(cats: Seq[String], complement: Boolean): DataFrame = {
      val r0 = ratios.filter(col("category").isin(cats: _*))
        .groupBy(col("year")).agg(sum(col("ratio")).as("r"))
      val r = if (complement) r0.withColumn("r", lit(1.0) - col("r")) else r0
      base.join(broadcast(r), Seq("year"), "left")
        .withColumn("em", col("amount") * col("coef") * col("r") / 1000.0)
        .groupBy(col("year")).agg(sum(col("em")).as("amount"))
    }

    branches.map { case (label, cats, complement) =>
      val e = emission(cats, complement)
      val scaled =
        if (label == "Scope 1") e.withColumn("amount", col("amount") * scope1Factor)
        else e
      scaled.withColumn("category", lit(label))
    }.reduce(_ unionByName _)
      .withColumn("unit", lit("Tonnes CO2e"))
      .withColumn("version", lit(versionYear))
      .withColumn("type", lit("target"))
  }

  /** Coefficient site aliases of this job (reference :28-30). */
  def decodeCoefSites(coef: DataFrame): DataFrame =
    coef.withColumn("site", Relational.decode(col("site"),
        Map("WIHK1" -> "WIHK-1", "WIHK2" -> "WIHK-2",
          "WMYP1" -> "WMY", "WMYP2" -> "WMY"), col("site")))
      .distinct()
}
