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

  /** NOT computeIfAbsent: builders memoize on top of other memoized frames
    * (a memoized query builder loads memoized tables), and a nested
    * `computeIfAbsent` on the same ConcurrentHashMap throws "Recursive
    * update" whenever the two keys hash to the same bin — a
    * key-layout-dependent crash that surfaces only when an unrelated entry
    * shifts the table. `synchronized` is reentrant, so nested builds on the
    * same thread are fine; cross-thread builds serialize, which is exactly
    * what a cache of session-lifetime persisted frames wants (two racing
    * builders would otherwise each pin a cached copy and leak one). */
  def apply(s: SparkSession, key: String)(build: => DataFrame): DataFrame = {
    val k = (s, key)
    val got = map.get(k)
    if (got != null) got
    else map.synchronized {
      val again = map.get(k)
      if (again != null) again
      else { val built = build; map.put(k, built); built }
    }
  }
}
