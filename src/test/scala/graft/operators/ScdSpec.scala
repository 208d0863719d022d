package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SCD type-2 merge: version history over snapshots. */
class ScdSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = to_timestamp(lit(s))

  private val attrs = Seq("city", "tier")

  private def snap0: DataFrame = Seq(
    ("A", "taipei", 1), ("B", "hsinchu", 2), ("C", "tainan", 3)
  ).toDF("k", "city", "tier")

  // A changes tier, B unchanged, C deleted, D new
  private def snap1: DataFrame = Seq(
    ("A", "taipei", 9), ("B", "hsinchu", 2), ("D", "kaohsiung", 1)
  ).toDF("k", "city", "tier")

  private def h1: DataFrame = Scd.merge2(
    Scd.firstLoad(snap0, "k", attrs, ts("2024-01-01 00:00:00")),
    snap1, "k", attrs, ts("2024-02-01 00:00:00"))

  private def rows(df: DataFrame): Set[(String, String, Int, String, String, Boolean)] =
    df.select(col("k"), col("city"), col("tier"),
        date_format(col("valid_from"), "yyyy-MM-dd"),
        coalesce(date_format(col("valid_to"), "yyyy-MM-dd"), lit("open")),
        col("is_current"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2), r.getString(3),
        r.getString(4), r.getBoolean(5))).toSet

  test("changed, unchanged, deleted, and new keys version correctly") {
    assert(rows(h1) == Set(
      ("A", "taipei", 1, "2024-01-01", "2024-02-01", false), // closed old
      ("A", "taipei", 9, "2024-02-01", "open", true),        // reopened
      ("B", "hsinchu", 2, "2024-01-01", "open", true),       // unchanged
      ("C", "tainan", 3, "2024-01-01", "2024-02-01", false), // deleted
      ("D", "kaohsiung", 1, "2024-02-01", "open", true)))    // new
  }

  test("re-merging an identical snapshot adds no versions (idempotent)") {
    val h2 = Scd.merge2(h1, snap1, "k", attrs, ts("2024-03-01 00:00:00"))
    assert(rows(h2) == rows(h1))
  }

  test("asOfSlice returns the version valid at the asked instant") {
    val before = Scd.asOfSlice(h1, ts("2024-01-15 00:00:00"))
      .select("k", "tier").as[(String, Int)].collect().toSet
    assert(before == Set(("A", 1), ("B", 2), ("C", 3)))
    val after = Scd.asOfSlice(h1, ts("2024-02-15 00:00:00"))
      .select("k", "tier").as[(String, Int)].collect().toSet
    assert(after == Set(("A", 9), ("B", 2), ("D", 1)))
  }

  test("null attribute values compare null-safely (no spurious versions)") {
    val s0 = Seq(("A", null.asInstanceOf[String], 1)).toDF("k", "city", "tier")
    val h = Scd.merge2(
      Scd.firstLoad(s0, "k", attrs, ts("2024-01-01 00:00:00")),
      s0, "k", attrs, ts("2024-02-01 00:00:00"))
    assert(h.count() == 1 && h.filter(col("is_current")).count() == 1)
  }
}
