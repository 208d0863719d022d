package graft.jobs

import java.sql.{Date => SqlDate, Timestamp}
import graft.SparkSpec

class StagingToAppSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s + " 00:00:00")
  private def d(s: String) = SqlDate.valueOf(s)

  test("applicableTariff: latest past rule, or earliest when a future rule exists") {
    val now = ts("2026-06-01")
    val rules = Seq(
      // area A: all in the past -> latest (2026-01-01)
      ("A", 1L, ts("2025-01-01")), ("A", 2L, ts("2026-01-01")),
      // area B: one future rule -> earliest overall (2024-01-01)
      ("B", 3L, ts("2024-01-01")), ("B", 4L, ts("2027-01-01"))
    ).toDF("area", "base_id", "guideline_date")
    val got = StagingToApp.applicableTariff(rules, now)
      .select("area", "base_id").as[(String, Long)].collect().toMap
    assert(got == Map("A" -> 2L, "B" -> 3L))
  }

  test("seasonalSplit keeps summer prices inside the window, non-summer outside") {
    val priced = Seq(
      (d("2026-07-01"), d("2026-06-01"), d("2026-09-30"), true, 1.5), // summer in window: keep
      (d("2026-07-01"), d("2026-06-01"), d("2026-09-30"), false, 1.0), // non-summer in window: drop
      (d("2026-02-01"), d("2026-06-01"), d("2026-09-30"), true, 1.5), // summer out of window: drop
      (d("2026-02-01"), d("2026-06-01"), d("2026-09-30"), false, 1.0) // non-summer outside: keep
    ).toDF("period_start", "start_date", "end_date", "is_summer", "price")
    val got = StagingToApp.seasonalSplit(priced)
      .select("period_start", "price").as[(SqlDate, Double)].collect().toSet
    assert(got == Set((d("2026-07-01"), 1.5), (d("2026-02-01"), 1.0)))
  }

  test("femRatio computes each plant's share of its site total") {
    val daily = Seq(
      ("P1", d("2026-01-03"), 30.0), ("P1", d("2026-01-04"), 30.0),
      ("P2", d("2026-01-03"), 40.0), ("PX", d("2026-01-03"), 99.0) // unmapped: dropped
    ).toDF("plant_code", "datadate", "power")
    val mapping = Seq(("WKS", "Plant1", "P1"), ("WKS", "Plant2", "P2"))
      .toDF("site", "plant", "plant_code")
    val got = SourceToRaw.femRatio(daily, mapping, d("2026-01-01"))
      .select("plant", "amount", "ratio").as[(String, Double, Double)]
      .collect().map { case (p, a, r) => p -> ((a, r)) }.toMap
    assert(got("Plant1") == ((60.0, 0.6)))
    assert(got("Plant2") == ((40.0, 0.4)))
  }
}
