package graft.sources

import java.sql.DriverManager
import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The S7 refresh's atomicity contract on a REAL database — parameterized
  * over BOTH embedded engines on the test classpath (Derby and DuckDB), so
  * the JDBC seam is proven dialect-PORTABLE, not Derby-shaped: the same
  * wrapper code must deliver the same transactional contract through two
  * unrelated SQL engines and two dialect objects (Spark's built-in Derby
  * dialect; graft's [[DuckDbDialect]]).
  *
  * The reference's own refresh (`conn.execute(DELETE); to_sql(append)`,
  * reference: jobs/raw_to_staging.py:201-205) commits the DELETE before the
  * load starts, so a mid-load failure exposes an empty window.
  * [[Jdbc.stagedSwapRefresh]] must never do that: the window flips inside
  * one transaction, and any failure before COMMIT leaves the old rows
  * visible. */
abstract class JdbcSwapBehavior extends SparkSpec {
  import spark.implicits._

  /** engine tag for test names */
  def engine: String
  /** JDBC url of a writable embedded database */
  def url: String
  /** A suite-lifetime connection pin for engines whose embedded instance
    * SHUTS DOWN with its last connection (DuckDB): without it, every
    * exec/queryRows open-close cycle restarts the database and replays the
    * WAL — which the intentional mid-transaction rollbacks in this suite
    * make non-trivial — between statements. A real server engine is never
    * restarted per-statement, so the pin models the contract under test,
    * not around it. Derby's in-memory db survives without one. */
  protected def pin: Option[java.sql.Connection] = None

  /** Live bindings override to gate on configuration: when false, every
    * test CANCELS (reported skipped, never failed) — the offline-sandbox
    * contract for [[JdbcSwapLiveSpec]]. */
  protected def available: Boolean = true

  private def exec(sql: String): Unit = {
    assume(available, s"[$engine] no live database configured " +
      "(set GRAFT_LIVE_JDBC_URL to run)")
    Jdbc.ensureDialects()
    pin // force the keep-alive before any other connection
    val c = DriverManager.getConnection(url)
    try c.createStatement().executeUpdate(sql) finally c.close()
  }

  private def queryRows(sql: String): Seq[(Int, String)] = {
    val c = DriverManager.getConnection(url)
    try {
      val rs = c.createStatement().executeQuery(sql)
      val buf = scala.collection.mutable.ArrayBuffer.empty[(Int, String)]
      while (rs.next()) buf += ((rs.getInt(1), rs.getString(2)))
      buf.toSeq
    } finally c.close()
  }

  private def freshTable(name: String, withPk: Boolean = false): Unit = {
    try exec(s"DROP TABLE $name") catch { case _: Exception => () }
    // quoted lowercase columns — the shape a Spark-created JDBC table has
    // (the writer quotes identifiers), and what Postgres's unquoted-DDL
    // case folding produces
    val pk = if (withPk) """, PRIMARY KEY ("id")""" else ""
    exec(s"""CREATE TABLE $name ("id" INT NOT NULL, "mon" VARCHAR(10) NOT NULL$pk)""")
    exec(s"INSERT INTO $name VALUES (1, '2024-01'), (2, '2024-01'), (9, '2024-02')")
  }

  test(s"[$engine] stagedSwapRefresh replaces exactly the deleted window") {
    freshTable("t_ok")
    val fresh = Seq((10, "2024-01"), (11, "2024-01")).toDF("id", "mon")
    Jdbc.stagedSwapRefresh(fresh, url, "t_ok", "\"mon\" = '2024-01'")
    val rows = queryRows("""SELECT "id", "mon" FROM t_ok ORDER BY "id"""").toSet
    assert(rows == Set((9, "2024-02"), (10, "2024-01"), (11, "2024-01")))
  }

  test(s"[$engine] a failure inside the swap transaction leaves the old window visible") {
    freshTable("t_fail", withPk = true)
    // the refresh data violates the target's PRIMARY KEY (duplicate id),
    // so the INSERT..SELECT fails AFTER the DELETE ran in the same
    // transaction — the rollback must restore the deleted window
    val bad = Seq((10, "2024-01"), (10, "2024-01")).toDF("id", "mon")
    intercept[Exception] {
      Jdbc.stagedSwapRefresh(bad, url, "t_fail", "\"mon\" = '2024-01'")
    }
    val rows = queryRows("""SELECT "id", "mon" FROM t_fail ORDER BY "id"""").toSet
    assert(rows == Set((1, "2024-01"), (2, "2024-01"), (9, "2024-02")),
      s"mid-swap failure exposed a partial window: $rows")
  }

  test(s"[$engine] a failure during the bulk load never touches the target at all") {
    freshTable("t_load")
    // the load itself throws (a poisoned partition) before any swap SQL
    val poisoned = Seq(1, 2, 3).toDF("id")
      .select(col("id"),
        udf((i: Int) => {
          if (i == 2) throw new RuntimeException("poisoned row")
          "2024-01"
        }).apply(col("id")).as("mon"))
    intercept[Exception] {
      Jdbc.stagedSwapRefresh(poisoned, url, "t_load", "\"mon\" = '2024-01'")
    }
    val rows = queryRows("""SELECT "id", "mon" FROM t_load ORDER BY "id"""").toSet
    assert(rows == Set((1, "2024-01"), (2, "2024-01"), (9, "2024-02")),
      s"failed bulk load modified the target: $rows")
  }

  test(s"[$engine] column order differences between frame and target are harmless") {
    freshTable("t_cols")
    // frame columns reversed vs the target's (id, mon) order: the INSERT
    // names its columns, so by-name matching must hold
    val fresh = Seq(("2024-01", 42)).toDF("mon", "id")
    Jdbc.stagedSwapRefresh(fresh, url, "t_cols", "\"mon\" = '2024-01'")
    val rows = queryRows("""SELECT "id", "mon" FROM t_cols ORDER BY "id"""").toSet
    assert(rows == Set((42, "2024-01"), (9, "2024-02")))
  }

  test(s"[$engine] deleteThenAppend documents its gap honestly: mid-append failure loses the window") {
    // the CONTRAST case — the reason stagedSwapRefresh exists. Not a
    // desired behavior, a pinned known limitation of the plain S7 shape.
    freshTable("t_gap", withPk = true)
    val bad = Seq((20, "2024-01"), (20, "2024-01")).toDF("id", "mon")
    intercept[Exception] {
      Jdbc.deleteThenAppend(bad, url, "t_gap", "\"mon\" = '2024-01'")
    }
    val rows = queryRows("""SELECT "id", "mon" FROM t_gap ORDER BY "id"""").toSet
    // the old window rows are gone (DELETE committed first) and what
    // remains in the window is at best a partial load — readers observe
    // a state that is neither the old window nor the new one
    assert(!rows.contains((1, "2024-01")) && !rows.contains((2, "2024-01")),
      s"expected the plain delete-then-append to have lost the old window: $rows")
  }
}

/** Derby binding (in-memory; the dialect ships inside Spark). */
class JdbcSwapSpec extends JdbcSwapBehavior {
  def engine = "derby"
  val url = "jdbc:derby:memory:swapdb;create=true"
}

/** DuckDB binding ([[DuckDbDialect]]). FILE-backed, not `jdbc:duckdb:`
  * in-memory: each in-memory connection is its OWN database, and the
  * refresh's executors and driver must all see one store — exactly the
  * multi-connection shape a server engine has. */
class JdbcSwapDuckDbSpec extends JdbcSwapBehavior {
  def engine = "duckdb"
  val url = "jdbc:duckdb:" +
    java.nio.file.Files.createTempDirectory("graft_swap_duck")
      .resolve("swap.db").toString
  override protected lazy val pin: Option[java.sql.Connection] = {
    Jdbc.ensureDialects()
    Some(DriverManager.getConnection(url))
  }
}

/** LIVE-endpoint binding (round-14 verdict ask #7, closing the "live
  * multi-database federation" row as far as a sandbox can): the SAME
  * staged-swap contract, against a real server database when
  * `GRAFT_LIVE_JDBC_URL` is set (e.g.
  * `jdbc:postgresql://host/db?user=u&password=p` with the driver jar on
  * the test classpath). Offline, every test cancels — skipped, never
  * failed. Requirements on the endpoint: a SCRATCH database (the suite
  * drops/creates its tables) with ANSI double-quote identifier quoting
  * (Postgres natively; MySQL needs `sql_mode=ANSI_QUOTES`). */
class JdbcSwapLiveSpec extends JdbcSwapBehavior {
  def engine = "live"
  override protected def available: Boolean =
    sys.env.get("GRAFT_LIVE_JDBC_URL").exists(_.nonEmpty)
  lazy val url: String =
    sys.env.getOrElse("GRAFT_LIVE_JDBC_URL", "jdbc:unset:live")
}
