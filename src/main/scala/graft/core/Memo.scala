package graft.core

import java.util.concurrent.ConcurrentHashMap
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session-scoped DataFrame memoization. Query builders are re-invoked for
  * every execution (warmup + measured passes + queries sharing a
  * sub-pipeline), so any plan that persists an intermediate must be
  * memoized — otherwise each invocation pins a fresh cached copy in block
  * storage for the session's lifetime. */
object Memo {

  private val map = new ConcurrentHashMap[(SparkSession, String), DataFrame]()

  def apply(s: SparkSession, key: String)(build: => DataFrame): DataFrame =
    map.computeIfAbsent((s, key), _ => build)
}
