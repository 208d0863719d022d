package graft.sources

import org.apache.spark.sql.connector.expressions.{Expression, Extract}
import org.apache.spark.sql.jdbc.{JdbcDialect, JdbcDialects, JdbcType}
import org.apache.spark.sql.types.{DataType, MetadataBuilder}

/** Derby dialect with an EXTRACT guard — fixes a measured upstream gap
  * (round 13, JdbcAggPushdownSpec): Spark's V2 SQL builder serializes
  * date-part predicates as ANSI `EXTRACT(YEAR FROM d)` WITHOUT consulting
  * `isSupportedFunction` (Extract has its own visitor), and the stock
  * DerbyDialect doesn't override the visitor — so a month-window filter
  * (`year(d) = 2023 AND month(d) = 6`, the reference's hot predicate
  * vocabulary) pushes EXTRACT into Derby, whose SQL has no such syntax,
  * and the QUERY FAILS at execution (`ERROR 42X01: Syntax error:
  * Encountered "YEAR"`). Pushdown must degrade, never break: refusing to
  * compile any expression tree containing an Extract makes Spark fetch
  * the rows and evaluate the predicate itself — correct result, one
  * predicate's pushdown lost.
  *
  * The stock DerbyDialect is `private[jdbc]`, so this wraps the instance
  * captured from the registry BEFORE our registration shadows it,
  * forwarding every method Derby overrides (type maps, limit clause,
  * error classification, the function whitelist) and guarding only
  * `compileExpression`.
  *
  * DuckDB needs no guard: the same EXTRACT spelling executes there
  * (spec-pinned with exact results in JdbcAggPushdownDuckDbSpec). */
object DerbyExtractGuardDialect extends JdbcDialect {

  // resolved at object init, which Jdbc.ensureDialects forces BEFORE
  // registering this object — so `inner` is the stock Derby dialect.
  // ensureDialects then UNREGISTERS it: with both in the registry, get()
  // wraps the two matching dialects in an AggregatedDialect whose
  // compileExpression is the guard-less base implementation — measured:
  // EXTRACT pushed again AND aggregate pushdown vanished.
  private[sources] val inner: JdbcDialect = JdbcDialects.get("jdbc:derby:probe")

  private def containsExtract(e: Expression): Boolean =
    e.isInstanceOf[Extract] || e.children().exists(containsExtract)

  override def compileExpression(expr: Expression): Option[String] =
    if (containsExtract(expr)) None else inner.compileExpression(expr)

  override def canHandle(url: String): Boolean = inner.canHandle(url)
  override def isSupportedFunction(funcName: String): Boolean =
    inner.isSupportedFunction(funcName)
  override def isObjectNotFoundException(e: java.sql.SQLException): Boolean =
    inner.isObjectNotFoundException(e)
  override def isSyntaxErrorBestEffort(e: java.sql.SQLException): Boolean =
    inner.isSyntaxErrorBestEffort(e)
  override def getCatalystType(sqlType: Int, typeName: String, size: Int,
                               md: MetadataBuilder): Option[DataType] =
    inner.getCatalystType(sqlType, typeName, size, md)
  override def getJDBCType(dt: DataType): Option[JdbcType] =
    inner.getJDBCType(dt)
  override def isCascadingTruncateTable(): Option[Boolean] =
    inner.isCascadingTruncateTable()
  override def renameTable(
      oldTable: org.apache.spark.sql.connector.catalog.Identifier,
      newTable: org.apache.spark.sql.connector.catalog.Identifier): String =
    inner.renameTable(oldTable, newTable)
  override def getTableCommentQuery(table: String, comment: String): String =
    inner.getTableCommentQuery(table, comment)
  override def getUpdateColumnNullabilityQuery(
      tableName: String, columnName: String, isNullable: Boolean): String =
    inner.getUpdateColumnNullabilityQuery(tableName, columnName, isNullable)
  override def getLimitClause(limit: Integer): String =
    inner.getLimitClause(limit)
  override def classifyException(
      e: Throwable, condition: String,
      messageParameters: Map[String, String], description: String,
      isRuntime: Boolean)
      : Throwable with org.apache.spark.SparkThrowable =
    inner.classifyException(e, condition, messageParameters, description,
      isRuntime)
}
