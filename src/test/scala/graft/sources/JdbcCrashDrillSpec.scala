package graft.sources

import java.sql.{Connection, DriverManager, PreparedStatement, ResultSet, SQLException, Statement}
import java.lang.reflect.{InvocationHandler, InvocationTargetException, Method, Proxy}
import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicInteger

import graft.SparkSpec
import org.apache.spark.sql.jdbc.{JdbcDialect, JdbcDialects}
import org.apache.spark.sql.types.{DataType, MetadataBuilder}

/** Statement-budget fault injection for JDBC — the `crashfs:` methodology
  * (jobs/CrashDrillSpec) carried to the database seam. A delegating
  * `jdbc:crash:<real>` driver counts every MUTATING call (executeUpdate /
  * executeBatch / execute / commit) across ALL connections — driver-side
  * swap SQL and executor-side bulk-load batches alike (local mode shares
  * the JVM, so the static budget reaches Spark's writer tasks) — and on
  * budget exhaustion simulates process death: every live underlying
  * connection is ABORTED (rolled back and closed — what a server does when
  * a dead client's socket drops, releasing its locks), and every
  * subsequent call on any wrapped object throws. `finally` cleanup dies
  * with the process, exactly like crashfs' kill semantics.
  */
private[sources] object CrashJdbc {
  val Prefix = "jdbc:crash:"

  private val budget = new AtomicInteger(Int.MaxValue)
  private val mutations = new AtomicInteger(0)
  @volatile private var dead = false
  private val live = ConcurrentHashMap.newKeySet[Connection]()

  /** counting mode: never crash, observe the mutation total */
  def disarm(): Unit = { dead = false; budget.set(Int.MaxValue); mutations.set(0) }
  /** crash once more than `allowed` mutations are attempted */
  def arm(allowed: Int): Unit = { dead = false; mutations.set(0); budget.set(allowed) }
  def observedMutations: Int = mutations.get()

  private def crashNow(at: Int): Nothing = {
    dead = true
    live.forEach { c =>
      try c.rollback() catch { case _: Exception => () }
      try c.close() catch { case _: Exception => () }
    }
    live.clear()
    throw new SQLException(s"injected crash at mutation $at")
  }
  private def check(): Unit =
    if (dead) throw new SQLException("connection lost (injected crash)")
  private def tick(): Unit = {
    check()
    val n = mutations.incrementAndGet()
    if (n > budget.get()) crashNow(n)
  }

  // the calls that change database state — commit included, so the
  // crash-at-commit-boundary case is drawn like any other
  private val mutators = Set("executeUpdate", "executeLargeUpdate",
    "executeBatch", "executeLargeBatch", "execute", "commit")

  private class H(target: AnyRef) extends InvocationHandler {
    override def invoke(proxy: AnyRef, m: Method, args: Array[AnyRef]): AnyRef = {
      check()
      if (mutators(m.getName)) tick()
      val r =
        try m.invoke(target, args: _*)
        catch { case e: InvocationTargetException => throw e.getCause }
      wrap(r)
    }
  }

  private[sources] def proxy[T](ifc: Class[T], target: AnyRef): T =
    Proxy.newProxyInstance(getClass.getClassLoader, Array(ifc), new H(target))
      .asInstanceOf[T]

  private[sources] def checkAlive(): Unit = check()
  private[sources] def track(c: Connection): Unit = live.add(c)

  private def wrap(r: AnyRef): AnyRef = r match {
    case c: Connection => proxy(classOf[Connection], c)
    case s: PreparedStatement => proxy(classOf[PreparedStatement], s)
    case s: Statement => proxy(classOf[Statement], s)
    case rs: ResultSet => proxy(classOf[ResultSet], rs)
    case md: java.sql.DatabaseMetaData => proxy(classOf[java.sql.DatabaseMetaData], md)
    case other => other
  }

  /** Spark resolves dialects by URL string, so the crash prefix must
    * delegate to the real engine's dialect or the writer's DDL types
    * change under the drill (default dialect maps String to TEXT, which
    * Derby rejects). */
  private class DelegatingDialect(prefix: String, real: JdbcDialect) extends JdbcDialect {
    override def canHandle(url: String): Boolean = url.startsWith(prefix)
    override def quoteIdentifier(c: String): String = real.quoteIdentifier(c)
    override def getJDBCType(dt: DataType) = real.getJDBCType(dt)
    override def getCatalystType(t: Int, n: String, s: Int, md: MetadataBuilder) =
      real.getCatalystType(t, n, s, md)
    override def isCascadingTruncateTable() = real.isCascadingTruncateTable()
  }

  @volatile private var installed = false
  def install(): Unit = synchronized {
    if (!installed) {
      Jdbc.ensureDialects()
      DriverManager.registerDriver(new CrashJdbcDriver)
      JdbcDialects.registerDialect(
        new DelegatingDialect(Prefix + "derby:", JdbcDialects.get("jdbc:derby:")))
      installed = true
    }
  }
}

/** `jdbc:crash:derby:...` → a wrapped connection to `jdbc:derby:...`.
  * TOP-LEVEL class (not nested in CrashJdbc): Spark's DriverRegistry
  * re-loads the driver by `getClass.getCanonicalName`, and a nested
  * class's canonical name (dots) is not its binary name (`$`) — the
  * classic inner-class JDBC-driver trap. */
private[sources] class CrashJdbcDriver extends java.sql.Driver {
  override def acceptsURL(url: String): Boolean = url.startsWith(CrashJdbc.Prefix)
  override def connect(url: String, info: java.util.Properties): Connection =
    if (!acceptsURL(url)) null
    else {
      CrashJdbc.checkAlive()
      val real = DriverManager.getConnection(
        "jdbc:" + url.substring(CrashJdbc.Prefix.length), info)
      CrashJdbc.track(real)
      CrashJdbc.proxy(classOf[Connection], real)
    }
  override def getMajorVersion = 1
  override def getMinorVersion = 0
  override def jdbcCompliant() = false
  override def getPropertyInfo(u: String, p: java.util.Properties) =
    Array.empty[java.sql.DriverPropertyInfo]
  override def getParentLogger = throw new java.sql.SQLFeatureNotSupportedException()
}

/** Randomized crash drill for the S7 staged-swap refresh
  * ([[Jdbc.stagedSwapRefresh]]): at EVERY drawn statement boundary —
  * bulk-load batches, stage DDL, the DELETE, the INSERT..SELECT, the
  * COMMIT, the stage-table cleanup — a simulated process death must leave
  * the target readable as EITHER the old window OR the new one (never a
  * partial state), and a disarmed re-run of the same refresh must
  * converge to the new state (retry idempotence; the replay-before-
  * compact analogue for the database seam). JdbcSwapSpec pins the chosen
  * failure points (PK violation mid-transaction, poisoned load); this
  * drill removes the choosing. Derby-bound: the in-memory engine with
  * real locks whose abandoned-transaction cleanup the abort models;
  * the dialect-portability of the swap itself is JdbcSwapDuckDbSpec's
  * job. */
class JdbcCrashDrillSpec extends SparkSpec {
  import spark.implicits._

  private val realUrl = "jdbc:derby:memory:crashdrill;create=true"
  private val crashUrl = CrashJdbc.Prefix + "derby:memory:crashdrill;create=true"
  private val table = "t_drill"
  private val where = "\"mon\" = '2024-01'"

  private val oldState = Set((1, "2024-01"), (2, "2024-01"), (9, "2024-02"))
  private val newState = Set((10, "2024-01"), (11, "2024-01"), (12, "2024-01"), (9, "2024-02"))

  private def freshDf = Seq((10, "2024-01"), (11, "2024-01"), (12, "2024-01"))
    .toDF("id", "mon").repartition(2)

  private def exec(sql: String): Unit = {
    val c = DriverManager.getConnection(realUrl)
    try c.createStatement().executeUpdate(sql) finally c.close()
  }
  private def reset(): Unit = {
    try exec(s"DROP TABLE $table") catch { case _: Exception => () }
    try exec(s"DROP TABLE ${table}_graft_stage") catch { case _: Exception => () }
    exec(s"""CREATE TABLE $table ("id" INT NOT NULL, "mon" VARCHAR(10) NOT NULL)""")
    exec(s"INSERT INTO $table VALUES (1, '2024-01'), (2, '2024-01'), (9, '2024-02')")
  }
  private def readTarget(): Set[(Int, String)] = {
    val c = DriverManager.getConnection(realUrl)
    try {
      val rs = c.createStatement()
        .executeQuery(s"""SELECT "id", "mon" FROM $table""")
      val buf = scala.collection.mutable.Set.empty[(Int, String)]
      while (rs.next()) buf += ((rs.getInt(1), rs.getString(2)))
      buf.toSet
    } finally c.close()
  }

  test("staged swap survives a crash at every drawn statement boundary") {
    CrashJdbc.install()
    reset()

    // counting run: how many mutating statements does one refresh make?
    CrashJdbc.disarm()
    Jdbc.stagedSwapRefresh(freshDf, crashUrl, table, where)
    val total = CrashJdbc.observedMutations
    assert(readTarget() == newState, "disarmed refresh through the crash driver diverged")
    assert(total >= 6,
      s"expected load batches + DDL + swap SQL to exceed 6 mutations, counted $total")

    val seed = System.nanoTime()
    val rnd = new scala.util.Random(seed)
    info(s"drill seed $seed; $total mutations per refresh")

    // every boundary is reachable; draw 12 budgets and always include the
    // edges (first mutation; the commit-adjacent tail)
    val budgets = (Seq(1, total - 1, total) ++
      Seq.fill(12)(1 + rnd.nextInt(total))).distinct.sorted
    var kills = 0
    for (b <- budgets) {
      reset()
      CrashJdbc.arm(b)
      val crashed =
        try { Jdbc.stagedSwapRefresh(freshDf, crashUrl, table, where); false }
        catch { case _: Exception => true }
      if (crashed) kills += 1
      val seen = readTarget()
      assert(seen == oldState || seen == newState,
        s"budget $b (seed $seed): target is neither old nor new window: $seen")
      // heal: the operational answer to any crash is rerun-the-refresh
      CrashJdbc.disarm()
      Jdbc.stagedSwapRefresh(freshDf, crashUrl, table, where)
      assert(readTarget() == newState,
        s"budget $b (seed $seed): disarmed retry did not converge")
    }
    assert(kills >= budgets.size - 1,
      s"drill lost its teeth: only $kills kills over ${budgets.size} budgets (seed $seed)")
    CrashJdbc.disarm()
  }

  test("a crash mid-swap-transaction is rolled back by the dead client's abort") {
    CrashJdbc.install()
    reset()
    CrashJdbc.disarm()
    Jdbc.stagedSwapRefresh(freshDf, crashUrl, table, where)
    val total = CrashJdbc.observedMutations
    // the last four mutations of a refresh are DELETE, INSERT..SELECT,
    // COMMIT, and the cleanup DROP; allowing total-3 lets the DELETE run
    // and kills the INSERT — the maximally dangerous boundary: only the
    // abort's rollback stands between the reader and a
    // deleted-but-unfilled window
    reset()
    CrashJdbc.arm(total - 3)
    intercept[Exception] {
      Jdbc.stagedSwapRefresh(freshDf, crashUrl, table, where)
    }
    assert(readTarget() == oldState,
      "mid-transaction crash exposed the deleted-but-unfilled window")
    CrashJdbc.disarm()
  }
}
