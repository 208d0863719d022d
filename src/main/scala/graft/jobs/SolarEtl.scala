package graft.jobs

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import graft.core.{Clock, DecarbDate, Sink}

/** The reference's solar mini-DAG (reference: jobs/solar_etl.py:15-38): the
  * synchronous re-run of the solar slice after a user edits remaining-power
  * data — four raw→staging tables, the elect_total dependency, then the
  * solar_energy_overview serving table, in the reference's order with its
  * error-isolation contract ([[Pipeline.run]]).
  *
  * Wired over a parquet warehouse with raw/staging/app namespaces under
  * `base` (the medallion layout of SURVEY.md §1.1); every refresh is a
  * dynamic-partition overwrite on `period_start` — the S7
  * delete-then-append semantics, atomic per partition.
  */
object SolarEtl {

  private def path(base: String, layer: String, table: String) =
    s"$base/$layer/$table"

  def jobs(base: String, clock: Clock): Seq[Pipeline.Job] = {
    def rd(s: SparkSession, layer: String, table: String): DataFrame =
      s.read.parquet(path(base, layer, table))
    def wr(df: DataFrame, layer: String, table: String): Unit =
      Sink.overwritePartitions(df, path(base, layer, table), Seq("period_start"))
    val reportingMonth = DecarbDate.previousMonthWindow(clock)._1

    Seq(
      Pipeline.Job("raw_to_staging:solar", s =>
        wr(RawToStaging.solar(
          rd(s, "raw", "solar"), rd(s, "raw", "plant_mapping"), clock),
          "staging", "solar")),
      Pipeline.Job("raw_to_staging:solar_remain", s =>
        wr(RawToStaging.solarRemain(
          rd(s, "raw", "solar_remain"), rd(s, "raw", "fem_ratio_solar"),
          rd(s, "raw", "solar_ratio"), rd(s, "raw", "plant_mapping"), clock),
          "staging", "solar_remain")),
      Pipeline.Job("raw_to_staging:solar_other", s =>
        wr(RawToStaging.solarOther(
          rd(s, "raw", "solar_other"), rd(s, "raw", "fem_ratio_solar"),
          rd(s, "raw", "plant_mapping"), clock),
          "staging", "solar_other")),
      Pipeline.Job("raw_to_staging:solar_info", s =>
        wr(RawToStaging.solarInfo(
          rd(s, "raw", "solar_info"),
          rd(s, "raw", "fem_ratio_solar")
            .filter(col("period_start") ===
              java.sql.Date.valueOf(reportingMonth)),
          reportingMonth, clock),
          "staging", "solar_info")),
      Pipeline.Job("raw_to_staging:elect_total", s =>
        wr(RawToStaging.electTotal(
          rd(s, "app", "elect_target_month"), rd(s, "raw", "fem_ratio_plant"),
          rd(s, "raw", "solar_ratio"), rd(s, "raw", "plant_mapping"), clock),
          "staging", "elect_total")),
      Pipeline.Job("staging_to_app:solar_energy_overview", s =>
        wr(StagingToApp.solarEnergyOverview(
          rd(s, "staging", "solar"), rd(s, "staging", "solar_remain"),
          rd(s, "staging", "solar_info"), rd(s, "staging", "solar_other"),
          rd(s, "staging", "elect_total"), clock),
          "app", "solar_energy_overview"))
    )
  }
}
