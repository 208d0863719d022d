package graft.operators

import graft.SparkSpec

class ProfileSpec extends SparkSpec {
  import spark.implicits._

  test("profile counts rows, nulls, and distincts per column in one pass") {
    val df = Seq(
      (1L, Some("a"), Some(1.5)),
      (2L, None, Some(1.5)),
      (3L, Some("a"), None),
      (4L, Some("b"), Some(2.5))
    ).toDF("id", "s", "v")
    val got = Profile.profile(df, Seq("id", "s", "v")).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got("id") == ((4L, 0L, 4L)))
    assert(got("s") == ((4L, 1L, 2L)))
    assert(got("v") == ((4L, 1L, 2L)))
  }

  test("keySkew flags the hot key with a proportionate salt factor, top-k without global sort") {
    // 80% of rows on one key at parallelism 8 → the hot key must recommend
    // ceil(0.8·8) = 7 salts; uniform keys recommend 1
    val rows = (1 to 1000).map(i => if (i <= 800) "hot" else s"k${i % 10}")
    val df = rows.toDF("k")
    val got = Profile.keySkew(df, "k", topK = 3, parallelism = 8)
    val plan = got.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"global sort in plan:\n$plan")
    val top = got.collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(top.head._1 == "hot" && top.head._2 == 800L)
    assert(top.head._3 == 800000L && top.head._4 == 7L)
    assert(top.tail.forall(_._4 == 1L), s"uniform keys over-salted: ${top.toSeq}")
  }

  test("distributionDrift surfaces vanished values with share 0 and exact ppm drift") {
    val a = (Seq.fill(50)("en") ++ Seq.fill(30)("de") ++ Seq.fill(20)("fr")).toDF("lang")
    val b = (Seq.fill(80)("en") ++ Seq.fill(20)("de")).toDF("lang") // fr vanished
    val got = Profile.distributionDrift(a, b, "lang").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got("fr") == ((200000L, 0L, 200000L)), s"vanished value missed: $got")
    assert(got("en") == ((500000L, 800000L, 300000L)))
    assert(got("de") == ((300000L, 200000L, 100000L)))
    // TV distance = Σ drift / 2e6 = 0.3
    assert(got.values.map(_._3).sum == 600000L)
  }

  test("checkNotNull reports only violating columns") {
    val df = Seq((1L, Some("a")), (2L, None)).toDF("id", "s")
    val bad = Profile.checkNotNull(df, Seq("id", "s")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bad == Map("s" -> 1L))
    assert(Profile.checkNotNull(df, Seq("id")).isEmpty)
  }
}
