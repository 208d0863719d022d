package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

class RelationalSpec extends SparkSpec {
  import spark.implicits._

  test("ytm computes a per-group running total ordered by month") {
    val df = Seq(
      ("A", 2024, 1, 10.0), ("A", 2024, 2, 5.0), ("A", 2024, 3, 1.0),
      ("B", 2024, 1, 7.0), ("A", 2025, 1, 2.0)
    ).toDF("site", "year", "month", "amount")
    val got = Relational.ytm(df, Seq("site", "year"), "month", "amount")
      .select("site", "year", "month", "ytm_amount")
      .as[(String, Int, Int, Double)].collect().toSet
    assert(got == Set(
      ("A", 2024, 1, 10.0), ("A", 2024, 2, 15.0), ("A", 2024, 3, 16.0),
      ("B", 2024, 1, 7.0), ("A", 2025, 1, 2.0)))
  }

  test("shareOfGroup divides by the partition total and nulls zero groups") {
    val df = Seq(("X", 2.0), ("X", 6.0), ("Y", 0.0)).toDF("g", "v")
    val got = Relational.shareOfGroup(df, Seq("g"), "v")
      .select("g", "v", "ratio").collect()
      .map(r => (r.getString(0), r.getDouble(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toSet
    assert(got == Set(("X", 2.0, Some(0.25)), ("X", 6.0, Some(0.75)),
      ("Y", 0.0, None)))
  }

  test("allRollup unions detail grain with an ALL row per detail key") {
    val df = Seq(("s1", "c1", 1.0), ("s1", "c2", 2.0), ("s2", "c1", 4.0))
      .toDF("site", "cat", "amount")
    val got = Relational.allRollup(df, Seq("site"), "cat",
        Seq(sum($"amount").as("amount")))
      .as[(String, String, Double)].collect().toSet
    assert(got == Set(
      ("s1", "c1", 1.0), ("s1", "c2", 2.0), ("s2", "c1", 4.0),
      ("s1", "ALL", 3.0), ("s2", "ALL", 4.0)))
  }

  test("decode recodes through the map with default for unmapped") {
    val df = Seq("綠電", "綠證", "other").toDF("cat")
    val got = df.select(Relational.decode($"cat",
        Map("綠電" -> "green_power", "綠證" -> "rec"), $"cat").as("decoded"))
      .as[String].collect().toSet
    assert(got == Set("green_power", "rec", "other"))
  }

  test("antiJoinZeroFill synthesizes zero rows for missing keys") {
    val prev = Seq(("s1", 5.0), ("s2", 8.0)).toDF("site", "amount")
    val cur = Seq(("s1", 6.0)).toDF("site", "amount")
    val got = Relational.antiJoinZeroFill(cur, prev, Seq("site"), Seq("amount"))
      .as[(String, Double)].collect().toSet
    assert(got == Set(("s2", 0.0)))
  }

  test("latest keeps exactly the max-version row per key") {
    val df = Seq(("t", 1, "old"), ("t", 3, "new"), ("t", 2, "mid"), ("u", 1, "only"))
      .toDF("k", "version", "payload")
    val got = Relational.latest(df, Seq("k"), Seq("version"))
      .as[(String, Int, String)].collect().toSet
    assert(got == Set(("t", 3, "new"), ("u", 1, "only")))
  }

  test("monthStart builds the first-of-month date") {
    val got = Seq((2024, 2)).toDF("y", "m")
      .select(Relational.monthStart($"y", $"m").cast("string")).as[String].head()
    assert(got == "2024-02-01")
  }
}
