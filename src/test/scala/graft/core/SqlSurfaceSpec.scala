package graft.core

import graft.SparkSpec

/** The engine's SQL face: after registerViews, plain Spark SQL text runs the
  * same plans the DataFrame queries build. */
class SqlSurfaceSpec extends SparkSpec {

  test("spark.sql can query every registered table") {
    Tables.registerViews(spark, sfSmoke)
    val revenue = spark.sql(
      """SELECT l_returnflag, sum(l_quantity) AS sum_qty
         FROM lineitem GROUP BY 1""").collect()
    assert(revenue.length == 3)

    val joined = spark.sql(
      """SELECT n_name, count(*) AS n
         FROM customer JOIN nation ON c_nationkey = n_nationkey
         GROUP BY n_name""").collect()
    assert(joined.length > 0)

    // events view carries the converted microsecond timestamp
    val hours = spark.sql(
      "SELECT date_trunc('hour', ts) AS h, count(*) FROM events GROUP BY 1")
      .collect()
    assert(hours.length > 0)

    Tables.all.foreach { t =>
      assert(spark.sql(s"SELECT count(*) FROM $t").head().getLong(0) > 0)
    }
  }
}
