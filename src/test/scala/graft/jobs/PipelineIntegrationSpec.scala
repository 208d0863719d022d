package graft.jobs

import java.nio.file.Files
import java.sql.{Date => SqlDate}
import java.time.LocalDate
import graft.SparkSpec
import graft.core.{FixedClock, Sink}
import org.apache.spark.sql.functions._

/** End-to-end mini-DAG: fixtures → RawToStaging transform → partitioned
  * staging table → idempotent monthly re-run — the §3.1 batch lifecycle
  * (source→raw→staging + S7 refresh) against real files. */
class PipelineIntegrationSpec extends SparkSpec {
  import spark.implicits._

  private def d(s: String) = SqlDate.valueOf(s)
  private val clock = FixedClock(LocalDate.of(2026, 3, 1))

  test("monthly refresh DAG is idempotent and only touches the refreshed month") {
    val stagingDir = Files.createTempDirectory("staging").toString + "/electricity_decarb"
    val boundary = Seq("S1").toDF("site")
    val solar = Seq(("S1", 5.0, d("2026-01-01"))).toDF("site", "amount", "period_start")

    def runMonth(origin: Seq[(String, Double, SqlDate, String)]): Unit = {
      val out = RawToStaging.electricityDecarb(
        origin.toDF("site", "amount", "period_start", "type"), solar, boundary, clock)
        .withColumn("period", date_format(col("period_start"), "yyyy-MM"))
      val failed = Pipeline.run(spark, Seq(
        Pipeline.Job("electricity_decarb",
          _ => Sink.overwritePartitions(out, stagingDir, Seq("period")))))
      assert(failed.isEmpty)
    }

    // first run: January
    runMonth(Seq(("S1", 100.0, d("2026-01-01"), "CSR")))
    val after1 = Sink.read(spark, stagingDir)
    assert(after1.count() == 2) // detail + ALL rollup

    // second run: corrected January (idempotent overwrite of the same month)
    runMonth(Seq(("S1", 300.0, d("2026-01-01"), "CSR")))
    val after2 = Sink.read(spark, stagingDir)
      .filter(col("site") === "S1")
      .select("amount").as[Double].collect().toSeq
    assert(after2 == Seq(305.0)) // 300 + 5 solar, exactly one row survives

    // third run: February arrives — January untouched
    runMonth(Seq(
      ("S1", 300.0, d("2026-01-01"), "CSR"),
      ("S1", 50.0, d("2026-02-01"), "CSR")))
    val feb = Sink.read(spark, stagingDir)
    assert(feb.filter(col("period") === "2026-01").count() == 2)
    assert(feb.filter(col("period") === "2026-02" && col("site") === "S1")
      .select("ytm_amount").as[Double].head() == 355.0) // 305 + 50 running total
  }
}
