package graft.sources

import java.sql.DriverManager
import graft.SparkSpec
import org.apache.spark.sql.functions._

/** S10's DSv2 aggregate pushdown on a REAL database, parameterized over
  * BOTH embedded engines (Derby and DuckDB — the dialect-portability
  * companion of JdbcSwapSpec): through [[Jdbc.registerPushdownCatalog]] a
  * `GROUP BY` aggregate must land in the JDBC scan itself
  * (`PushedAggregates` in the plan) — the remote engine computes the groups
  * and only group rows cross the wire — and the pushed plan's result must
  * equal the unpushed V1 plan's, whichever dialect compiles the SQL.
  *
  * The reference gets this effect by hand-writing aggregate SQL against its
  * MySQL source (reference: jobs/renew_green_energy.py:205-214); the
  * engine gets it from Catalyst's V2 pushdown with no SQL strings — and
  * adding an engine costs one dialect object, not a new set of strings. */
abstract class JdbcAggPushdownBehavior extends SparkSpec {

  def engine: String
  def url: String
  /** catalog name to register (unique per engine — the session is shared) */
  def catalog: String
  /** fully-qualified Spark table reference `<catalog>.<schema>.<table>` */
  def tableRef: String
  /** engines whose embedded instance closes with its last connection
    * (DuckDB) pin one for the suite — see JdbcSwapBehavior.pin */
  protected def pin: Option[java.sql.Connection] = None

  /** Live bindings override to gate on configuration: when false, every
    * test CANCELS (skipped, never failed) — see [[JdbcAggPushdownLiveSpec]]. */
  protected def available: Boolean = true

  /** the DATET table's Spark reference; live engines override for their
    * identifier folding */
  def dateTableRef: String = tableRef.replace("AGGT", "DATET")

  private def exec(sql: String): Unit = {
    assume(available, s"[$engine] no live database configured " +
      "(set GRAFT_LIVE_JDBC_URL to run)")
    Jdbc.ensureDialects()
    pin
    val c = DriverManager.getConnection(url)
    try c.createStatement().executeUpdate(sql) finally c.close()
  }

  private def fresh(): Unit = {
    try exec("DROP TABLE AGGT") catch { case _: Exception => () }
    // unquoted DDL: each engine applies its own identifier folding (Derby
    // uppercases, DuckDB preserves) — the catalog must resolve the
    // stored-case identifier either way
    exec("CREATE TABLE AGGT (K INT NOT NULL, V INT NOT NULL)")
    exec("INSERT INTO AGGT VALUES (1, 10), (1, 32), (2, 5), (3, 7), (3, 0)")
  }

  private def freshDates(): Unit = {
    try exec("DROP TABLE DATET") catch { case _: Exception => () }
    exec("CREATE TABLE DATET (K INT NOT NULL, D DATE NOT NULL)")
    exec("""INSERT INTO DATET VALUES
      (1, '2023-06-05'), (2, '2023-06-28'), (3, '2023-07-02'),
      (4, '2022-06-15'), (5, '2023-06-30')""")
  }

  /** whether this engine's dialect is expected to push EXTRACT-class date
    * predicates into the remote scan (the reference's month-window
    * predicate vocabulary — SURVEY §2.8 date family) */
  def expectDatePushdown: Boolean

  test(s"[$engine] month-window date predicate: pushdown per dialect, result exact") {
    freshDates()
    Jdbc.registerPushdownCatalog(spark, catalog, url)
    val df = spark.table(dateTableRef)
      .filter(year(col("D")) === 2023 && month(col("D")) === 6)
      .groupBy(col("K")).agg(count(lit(1)).as("n"))
    val plan = df.queryExecution.executedPlan.toString
    if (expectDatePushdown)
      assert(plan.contains("EXTRACT"),
        s"month-window predicate did not push as EXTRACT:\n$plan")
    else
      assert(!plan.contains("EXTRACT"),
        s"dialect unexpectedly pushed EXTRACT (update the expectation " +
          s"AND verify the remote engine accepts the spelling):\n$plan")
    // result must be exact either way — pushdown is an optimization, not
    // a semantics change
    val got = df.collect().map(r => (r.getAs[Number](0).longValue,
      r.getAs[Number](1).longValue)).toSet
    assert(got == Set((1L, 1L), (2L, 1L), (5L, 1L)), s"wrong rows: $got")
  }

  test(s"[$engine] GROUP BY sum/count/min/max compile into the JDBC scan") {
    fresh()
    Jdbc.registerPushdownCatalog(spark, catalog, url)
    val df = spark.table(tableRef)
      .groupBy(col("K"))
      .agg(sum(col("V")).as("sv"), count(lit(1)).as("n"),
        min(col("V")).as("mn"), max(col("V")).as("mx"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedAggregates"),
      s"aggregate did not push into the JDBC scan:\n$plan")
    assert(plan.contains("SUM(") && plan.contains("MIN(") &&
      plan.contains("MAX("), s"missing pushed functions:\n$plan")
    assert(plan.contains("PushedGroupByExpressions"),
      s"group-by did not push:\n$plan")
    // type-agnostic accessors: engines differ in how their JDBC metadata
    // sizes INT (DuckDB's driver reports widths Spark maps to bigint)
    val got = df.collect()
      .map(r => (0 to 4).map(i => r.getAs[Number](i).longValue)).toSet
    assert(got == Set(Seq(1L, 42L, 2L, 10L, 32L), Seq(2L, 5L, 1L, 5L, 5L),
      Seq(3L, 7L, 2L, 0L, 7L)))
  }

  test(s"[$engine] pushed plan equals the unpushed V1 read on the same table") {
    fresh()
    Jdbc.registerPushdownCatalog(spark, catalog, url)
    def pairs(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => (r.getAs[Number](0).longValue,
        r.getAs[Number](1).longValue)).toSet
    val pushed = pairs(spark.table(tableRef)
      .groupBy(col("K")).agg(sum(col("V")).as("sv")).collect())
    // V1 path: full rows transfer, Spark aggregates locally
    val v1 = pairs(Jdbc.read(spark, url, "AGGT")
      .groupBy(col("K")).agg(sum(col("V")).as("sv")).collect())
    assert(pushed == v1 && pushed.nonEmpty)
  }

  test(s"[$engine] filter composes with the pushed aggregate") {
    fresh()
    Jdbc.registerPushdownCatalog(spark, catalog, url)
    val df = spark.table(tableRef)
      .filter(col("V") > 0)
      .groupBy(col("K")).agg(sum(col("V")).as("sv"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedAggregates"), s"no pushed agg:\n$plan")
    assert(plan.contains("PushedFilters: [V IS NOT NULL, V > 0]") ||
      plan.contains("V > 0"), s"filter not pushed alongside:\n$plan")
    val got = df.collect().map(r => (r.getAs[Number](0).longValue,
      r.getAs[Number](1).longValue)).toSet
    assert(got == Set((1L, 42L), (2L, 5L), (3L, 7L)))
  }
}

/** Derby binding (dialect ships inside Spark; unquoted DDL folds to
  * uppercase under the APP schema). */
class JdbcAggPushdownSpec extends JdbcAggPushdownBehavior {
  def engine = "derby"
  def expectDatePushdown = false // EXTRACT is a Derby syntax error — guarded (DerbyExtractGuardDialect)
  val url = "jdbc:derby:memory:aggdb;create=true"
  def catalog = "aggcat"
  def tableRef = "aggcat.APP.AGGT"
}

/** DuckDB binding ([[DuckDbDialect]]; case-preserving identifiers under
  * the main schema). File-backed for the same multi-connection reason as
  * JdbcSwapDuckDbSpec. */
class JdbcAggPushdownDuckDbSpec extends JdbcAggPushdownBehavior {
  def engine = "duckdb"
  def expectDatePushdown = true
  val url = "jdbc:duckdb:" +
    java.nio.file.Files.createTempDirectory("graft_agg_duck")
      .resolve("agg.db").toString
  def catalog = "duckcat"
  def tableRef = "duckcat.main.AGGT"
  override protected lazy val pin: Option[java.sql.Connection] = {
    Jdbc.ensureDialects()
    Some(DriverManager.getConnection(url))
  }
}

/** LIVE-endpoint binding (round-14 verdict ask #7): the same
  * pushdown-contract suite against a real server database when
  * `GRAFT_LIVE_JDBC_URL` is set; offline every test cancels. Defaults
  * assume Postgres identifier folding (unquoted DDL → lowercase under
  * schema `public`; override with GRAFT_LIVE_JDBC_SCHEMA). EXTRACT
  * pushdown is asserted only when GRAFT_LIVE_EXPECT_EXTRACT=1 — whether
  * the dialect compiles date parts remotely is engine-specific, and the
  * suite's exact-result assertions hold either way. */
class JdbcAggPushdownLiveSpec extends JdbcAggPushdownBehavior {
  def engine = "live"
  override protected def available: Boolean =
    sys.env.get("GRAFT_LIVE_JDBC_URL").exists(_.nonEmpty)
  lazy val url: String =
    sys.env.getOrElse("GRAFT_LIVE_JDBC_URL", "jdbc:unset:live")
  def expectDatePushdown = sys.env.get("GRAFT_LIVE_EXPECT_EXTRACT").contains("1")
  def catalog = "livecat"
  private def schema = sys.env.getOrElse("GRAFT_LIVE_JDBC_SCHEMA", "public")
  def tableRef = s"livecat.$schema.aggt"
  override def dateTableRef = s"livecat.$schema.datet"
}
