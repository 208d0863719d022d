package graft.jobs

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Clock
import graft.sources.ExcelSource

/** Reconstruction of the reference's MISSING `elec_transfer` package
  * (SURVEY.md §7.4.10): `config.py` and the `elec_transfer` package are
  * absent from the snapshot, but the call sites pin the contract —
  *  - `upload_excel_to_DB(file)` (reference:
  *    app/green_power/reconciliation.py:59-60, app/celery.py:21): a Celery
  *    task taking a base64 xlsx from the 綠電轉供對帳 (green-power
  *    reconciliation) upload endpoint and writing it to the database;
  *  - `next_year_green_power_transfer_suggest(stage)` (reference:
  *    main.py:110): a cron step running right after
  *    `staging_to_app('green_elec_transfer_account')`, producing next-year
  *    transfer suggestions.
  *
  * The bodies below are re-specified from those contracts plus the serving
  * table they consume (app.green_elec_transfer_account — see
  * [[StagingToApp.greenElecTransferAccount]]); the exact reference math is
  * unknowable from the snapshot and is documented per method.
  */
object ElecTransfer {

  /** Excel→frame leg of `upload_excel_to_DB`: a reconciliation sheet of
    * (provider, meter, month, transferred kWh) rows under a header row.
    * All-string parse (like every upload in the reference), explicit casts,
    * empty cells → null → 0. */
  def uploadReconciliation(spark: SparkSession, xlsx: Array[Byte],
                           clock: Clock): DataFrame =
    ExcelSource.read(spark, xlsx, skipRows = 0)
      .select(col("provider_name"), col("meter_code"),
        expr("try_cast(month AS int)").as("month"),
        expr("try_cast(amount AS double)").as("amount"))
      .na.fill(0.0, Seq("amount"))
      .withColumn("last_update_time",
        lit(java.sql.Timestamp.valueOf(clock.today.atStartOfDay())))

  /** Next-year transfer suggestion per meter: from the reconciliation
    * account's monthly green transfer volumes and grey totals, suggest the
    * volume needed to lift each meter to `targetGreenRate` — keeping the
    * current volume where it already exceeds the target. Same-month
    * seasonality is preserved (suggestions are per calendar month of the
    * coming year).
    *
    * @param transferAccount app.green_elec_transfer_account rows:
    *                        (site, plant, meter_code, provider_name,
    *                        category1, category2, amount, year, month)
    */
  def nextYearTransferSuggest(transferAccount: DataFrame, year: Int,
                              targetGreenRate: Double): DataFrame = {
    val keys = Seq("site", "plant", "meter_code", "provider_name", "month")
    def slice(cat1: String) = transferAccount
      .filter(col("year") === year && col("category1") === cat1 &&
        col("category2") === "elect_total" && col("site") =!= "ALL" &&
        col("plant") =!= "ALL")
      .select((keys :+ "amount").map(col): _*)
    val green = slice("green_elect_vol").withColumnRenamed("amount", "green_vol")
    val total = slice("grey_elect").withColumnRenamed("amount", "total_vol")
    green.join(total, keys, "outer")
      .na.fill(0.0, Seq("green_vol", "total_vol"))
      .withColumn("suggest_vol",
        greatest(col("green_vol"), col("total_vol") * targetGreenRate))
      .withColumn("year", lit(year + 1))
      .withColumn("current_rate",
        when(col("total_vol") =!= 0, col("green_vol") / col("total_vol")))
  }
}
