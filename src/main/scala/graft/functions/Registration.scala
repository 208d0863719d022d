package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry

/** Shared access to the session's function registry — the one cast both
  * native-expression modules need to expose their builders as callable
  * session functions. */
private[functions] object Registration {
  def registry(spark: SparkSession): FunctionRegistry =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
}
