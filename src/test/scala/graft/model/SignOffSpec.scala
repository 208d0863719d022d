package graft.model

import java.sql.{Date => SqlDate}
import graft.SparkSpec
import graft.jobs.StagingCal

class SignOffSpec extends SparkSpec {
  import spark.implicits._

  test("version lifecycle: stage, sign off, approve, consume latest validated") {
    val existing = Seq((1, 2026, true, 10.0), (2, 2026, true, 11.0))
      .toDF("version", "version_year", "validate", "amount")
    assert(SignOff.nextVersion(existing) == 3)

    val ids = Iterator("id-001", "id-002")
    val gen = new SignOff.IdGen { override def next(): String = ids.next() }
    val rec = SignOff.create(3, 2026, "pic@co", "reviewer@co", gen)
    assert(rec == SignOff.Record("id-001", 3, 2026, "pic@co", "reviewer@co", "pending"))

    val staged = SignOff.stage(Seq(12.0).toDF("amount"), 3, 2026)
    val all = existing.unionByName(
      staged.select("version", "version_year", "validate", "amount"))

    // before approval the latest validated version is still 2
    val before = SignOff.latestValidated(all)
      .select("version", "amount").as[(Int, Double)].head()
    assert(before == ((2, 11.0)))

    val approved = SignOff.approve(all, 3)
    val after = SignOff.latestValidated(approved)
      .select("version", "amount").as[(Int, Double)].head()
    assert(after == ((3, 12.0)))
  }

  test("reductionPct computes (current-base)/base with null-safe zero base") {
    def d(s: String) = SqlDate.valueOf(s)
    val cur = Seq((d("2026-01-01"), 80.0), (d("2026-02-01"), 50.0))
      .toDF("period_start", "amount")
    val base = Seq((d("2026-01-01"), 100.0), (d("2026-02-01"), 0.0))
      .toDF("period_start", "amount")
    val got = StagingCal.reductionPct(cur, base).collect()
      .map(r => r.getDate(0).toString ->
        (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    assert(got("2026-01-01").contains(-0.2))
    assert(got("2026-02-01").isEmpty) // zero baseline -> null, not Inf
  }
}
