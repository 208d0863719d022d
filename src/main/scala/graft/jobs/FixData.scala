package graft.jobs

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.Relational

/** Data-repair stage (DAG step 2): sites reported in the comparison month
  * but absent from the current month are synthesized as zero-amount rows so
  * downstream YTM/rollups see a dense site panel
  * (reference: jobs/fix_data.py:32-145 `fix_raw` / `fix_raw_elect_decarb` —
  * computed there as a Python set-difference + row loop + per-site keyed
  * DELETE/append).
  *
  * Distributed form: one `left_anti` join builds all missing rows at once
  * ([[Relational.antiJoinZeroFill]]); the caller overwrites the month
  * partition via [[graft.core.Sink]] instead of per-row DELETEs.
  */
object FixData {

  /** @param current  current-month slice of the raw table
    * @param previous comparison-month slice (reference uses month-6)
    * @param keyCols  identity columns carried onto the synthesized rows
    * @return current ∪ zero-rows for missing sites, with `period_start`
    *         restamped to the current month */
  def fixRaw(current: DataFrame, previous: DataFrame, periodStart: java.sql.Date,
             keyCols: Seq[String] = Seq("site")): DataFrame = {
    val zeroRows = Relational
      .antiJoinZeroFill(current, previous, keyCols, Seq("amount"))
      .withColumn("period_start", lit(periodStart))
    current.unionByName(zeroRows.select(current.columns.toIndexedSeq.map(col): _*))
  }
}
