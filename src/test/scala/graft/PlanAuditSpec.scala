package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec

/** Plan-shape assertions: column pruning and predicate pushdown must reach
  * the parquet scans (the properties PERF.md claims — asserted here so a
  * regression fails the suite, not just the eyeball audit via graft.Explain). */
class PlanAuditSpec extends SparkSpec {

  private def scans(df: DataFrame): Seq[FileSourceScanExec] =
    df.queryExecution.sparkPlan.collect { case f: FileSourceScanExec => f }

  test("t13 stratified sample reads only (doc_id, lang) — text pruned") {
    val df = SparkEntry.queries("t13_stratified_sample")(spark, sfSmoke)
    val cols = scans(df).flatMap(_.requiredSchema.fieldNames).toSet
    assert(cols == Set("doc_id", "lang"), s"scan read $cols")
  }

  test("q03 pushes filter predicates into the parquet scan") {
    val df = SparkEntry.queries("q03_filter_predicates")(spark, sfSmoke)
    val pushed = scans(df).flatMap(_.metadata.get("PushedFilters")).mkString
    assert(pushed.nonEmpty && pushed != "[]", s"no pushed filters: $pushed")
  }

  test("t05 exact dedup reads only (doc_id, text)") {
    val df = SparkEntry.queries("t05_dedup_exact")(spark, sfSmoke)
    val cols = scans(df).flatMap(_.requiredSchema.fieldNames).toSet
    assert(cols == Set("doc_id", "text"), s"scan read $cols")
  }
}
