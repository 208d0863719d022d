package graft.jobs

import graft.SparkSpec

class DecarbPathSpec extends SparkSpec {
  import spark.implicits._

  test("decarbPath computes the five category branches from one base") {
    val sim = Seq(("S1", 2026, 1000.0), ("S2", 2026, 500.0))
      .toDF("site", "year", "amount")
    val coef = Seq(("S1", 2026, 0.5), ("S2", 2026, 0.8))
      .toDF("site", "year", "coef")
    val ratios = Seq((2026, "REC", 0.1), (2026, "PPA", 0.2), (2026, "solar", 0.3))
      .toDF("year", "category", "ratio")

    val got = DecarbPath.decarbPath(sim, coef, ratios, versionYear = 2026)
      .select("category", "amount").as[(String, Double)].collect().toMap

    // base emission (ratio=1): (1000*0.5 + 500*0.8)/1000 = 0.9 tonnes
    val full = 0.9
    assert(approx(got("RECs"), full * 0.1))
    assert(approx(got("PPA"), full * 0.2))
    assert(approx(got("Solar Power Generation"), full * 0.3))
    // market-based remainder: 1 - 0.6
    assert(approx(got("Scope 2 (Scope 2-REC)"), full * 0.4))
    // location-based remainder (1 - PPA - solar) x 6%/94%
    assert(approx(got("Scope 1"), full * 0.5 * 0.06 / 0.94))
  }

  test("decodeCoefSites collapses aliased sites") {
    val coef = Seq(("WIHK1", 2026, 0.5), ("WMYP1", 2026, 0.7), ("WMYP2", 2026, 0.7))
      .toDF("site", "year", "coef")
    val got = DecarbPath.decodeCoefSites(coef)
      .select("site").as[String].collect().sorted.toSeq
    assert(got == Seq("WIHK-1", "WMY"))
  }
}
