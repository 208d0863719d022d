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

  test("checkNotNull reports only violating columns") {
    val df = Seq((1L, Some("a")), (2L, None)).toDF("id", "s")
    val bad = Profile.checkNotNull(df, Seq("id", "s")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bad == Map("s" -> 1L))
    assert(Profile.checkNotNull(df, Seq("id")).isEmpty)
  }
}
