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
  private val locks = new ConcurrentHashMap[(SparkSession, String), Object]()

  /** NOT computeIfAbsent on the value map: builders memoize on top of other
    * memoized frames (a memoized query builder loads memoized tables), and
    * a nested `computeIfAbsent` on one ConcurrentHashMap throws "Recursive
    * update" whenever the two keys hash to the same bin — a
    * key-layout-dependent crash that surfaces only when an unrelated entry
    * shifts the table. Instead: double-checked locking on a PER-KEY monitor
    * (the lock map's own computeIfAbsent never recurses — its builder is
    * `new Object`). Per-key rather than one global lock because a build can
    * run whole eager Spark jobs (NearDup's dictionary rank takes minutes at
    * scale) and must not stall an unrelated table load in another thread.
    * Same-key racing builders serialize, so exactly one persisted frame is
    * ever pinned. No deadlock from nesting: builds only nest DOWNWARD
    * (query → operator → table — a table build never requests a query
    * key), so lock acquisition order is acyclic. */
  def apply(s: SparkSession, key: String)(build: => DataFrame): DataFrame = {
    val k = (s, key)
    val got = map.get(k)
    if (got != null) got
    else locks.computeIfAbsent(k, _ => new Object).synchronized {
      val again = map.get(k)
      if (again != null) again
      else { val built = build; map.put(k, built); built }
    }
  }
}
