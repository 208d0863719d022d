package graft.sources

import java.util.Locale
import org.apache.spark.sql.jdbc.JdbcDialect

/** DuckDB [[JdbcDialect]] — the engine's proof that the JDBC seam is
  * DIALECT-PORTABLE, not Derby-shaped: adding a database engine is this one
  * small object plus [[Jdbc.ensureDialects]] registration, with zero change
  * to the read/write/refresh wrappers (the reference instead hand-binds each
  * engine's SQL strings — reference: models/engine_source.py:27-52).
  *
  * DuckDB speaks near-stock ANSI, so almost everything rides the
  * [[JdbcDialect]] defaults (double-quoted identifiers, the common JDBC type
  * map, default aggregate compilation for the DSv2 pushdown path). The only
  * semantics pinned here:
  *   - `canHandle` claims the `jdbc:duckdb:` scheme so the seam routes to
  *     ONE deterministic dialect instead of whatever NoopDialect defaults
  *     drift to across Spark upgrades;
  *   - identifier quoting escapes embedded quotes (the default just wraps);
  *   - TRUNCATE TABLE does not cascade in DuckDB.
  *
  * JdbcSwapSpec/JdbcAggPushdownSpec run their full contracts (transactional
  * staged swap, DSv2 aggregate pushdown) on BOTH embedded engines.
  */
object DuckDbDialect extends JdbcDialect {

  override def canHandle(url: String): Boolean =
    url.toLowerCase(Locale.ROOT).startsWith("jdbc:duckdb:")

  override def quoteIdentifier(colName: String): String =
    "\"" + colName.replace("\"", "\"\"") + "\""

  override def isCascadingTruncateTable(): Option[Boolean] = Some(false)

  /** Functions the DSv2 pushdown may compile into DuckDB SQL. The base
    * dialect whitelists NOTHING (`isSupportedFunction` = false), so without
    * this list every aggregate pushdown silently degrades to a full-table
    * transfer — the exact wire-bound shape [[Jdbc.registerPushdownCatalog]]
    * exists to avoid. Conservative: standard aggregates plus scalar
    * functions DuckDB spells identically to Spark's V2 canonical names. */
  private val supported: Set[String] = Set(
    "SUM", "COUNT", "MIN", "MAX", "AVG",
    "ABS", "COALESCE", "GREATEST", "LEAST",
    "LN", "LOG10", "EXP", "POWER", "SQRT", "FLOOR", "CEIL", "ROUND",
    "SIN", "COS", "TAN", "ASIN", "ACOS", "ATAN", "ATAN2",
    "UPPER", "LOWER", "TRIM", "SUBSTRING")

  override def isSupportedFunction(funcName: String): Boolean =
    supported.contains(funcName)

  /** DuckDB surfaces types Spark's common JDBC map has no entry for —
    * notably HUGEINT (int128, the return type of SUM over integers, so
    * EVERY pushed SUM trips over it). int128 doesn't fit any Spark
    * integral type; the widest exact type Spark has is Decimal(38,0),
    * which covers all practically reachable sums (a 10³⁸ overflow needs
    * ~10²⁰ max-long rows). */
  override def getCatalystType(
      sqlType: Int, typeName: String, size: Int,
      md: org.apache.spark.sql.types.MetadataBuilder)
      : Option[org.apache.spark.sql.types.DataType] = typeName match {
    case "HUGEINT" => Some(org.apache.spark.sql.types.DecimalType(38, 0))
    case _ => None
  }

  /** DuckDB's JDBC driver reports missing objects with a NULL SQLState and
    * a `Catalog Error: ... does not exist` message, so the base dialect's
    * SQLState heuristic never recognizes them — Spark's `tableExists`
    * probe (SELECT 1 FROM t WHERE 1=0) would then RETHROW instead of
    * answering false and every first write to a new table would fail.
    * Dialect-specific knowledge like this is exactly what the seam is
    * for. */
  override def isObjectNotFoundException(e: java.sql.SQLException): Boolean = {
    val m = String.valueOf(e.getMessage)
    m.contains("Catalog Error") &&
      (m.contains("does not exist") || m.contains("not found"))
  }
}
