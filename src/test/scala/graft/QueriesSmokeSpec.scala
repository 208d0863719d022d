package graft

/** Every registry query must plan and execute at sf0.001; the flagship entry
  * must return rows (the driver's smoke contract). */
class QueriesSmokeSpec extends SparkSpec {

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle-backed query has matching column aliases on both sides") {
    // cheap guard against the hash-mismatch footgun: the DuckDB result must
    // project the same column names the Spark plan produces
    SparkEntry.registry.filter(_.oracle.isDefined).foreach { q =>
      val cols = q.run(spark, sfSmoke).columns.toSet
      val sql = q.oracle.get.toLowerCase
      cols.foreach { c =>
        assert(sql.contains(c.toLowerCase),
          s"${q.name}: engine column '$c' not mentioned in oracle SQL")
      }
    }
  }

  SparkEntry.registry.foreach { q =>
    test(s"${q.name} executes at sf0.001") {
      val df = q.run(spark, sfSmoke)
      assert(df.columns.nonEmpty)
      assert(df.count() >= 0)
    }
  }
}
