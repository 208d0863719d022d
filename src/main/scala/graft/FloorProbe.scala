package graft

import org.apache.spark.sql.functions._

/** Measures Spark's irreducible per-action latency on this host — the
  * "scheduler floor" that the comparator band's lower mode has been
  * attributed to since round 11 WITHOUT a figure of record. DuckDB runs a
  * sub-second gate query in ~30 ms because its only fixed cost is a
  * function call; every Spark action pays plan → optimize → (possibly
  * AQE re-plan per shuffle stage) → schedule 32 tasks → collect, even
  * when the data is one row. This probe pins that cost with four
  * MEASURED rungs (min over `passes`, default 20, after a JIT warmup):
  *
  *   - `job_floor_sec`:    one-stage action on an in-memory range —
  *                         pure schedule/collect cost, no IO, no shuffle
  *   - `stage_floor_sec`:  the INCREMENT for one AQE shuffle stage
  *                         (two-stage groupBy minus the one-stage rung)
  *   - `scan_floor_sec`:   smallest parquet scan→collect (documents at
  *                         the probed sf, count only) — adds file
  *                         listing, footer read, and columnar decode
  *                         setup to the job floor
  *   - `query_floor_sec`:  a representative tiny gate query shape
  *                         (scan → filter → groupBy → collect): what a
  *                         sub-second bench entry cannot go below
  *
  * A gate query with J shuffle stages has a floor of roughly
  * `scan_floor + (J-1)·stage_floor`; the sub-second band of the pairing
  * set sits at 2–5× DuckDB's ENTIRE runtime in pure floor, which is the
  * measured content of "the engine loses the sub-second mode on
  * scheduling, not on work" (PERF.md "comparator shape"). At 100 TB the
  * same floor is amortized over minutes-long stages — it prices the
  * LOCAL gate comparison only.
  *
  * Spin probes bracket the run like every r15 measurement tool, so floor
  * readings are only citable from quiet windows (the floor itself
  * inflates ~2× in the host's degraded mode).
  */
object FloorProbe {
  def main(args: Array[String]): Unit = {
    // run_verify.sh forwards its SF/OUT placeholders — accept only args
    // that parse (a real directory; a number), like Bench ignores "x x"
    val sfDir = args.headOption
      .filter(a => new java.io.File(a).isDirectory)
      .getOrElse("/root/testdata/sf0.1")
    val passes = args.lift(1).flatMap(_.toIntOption).getOrElse(20)
    val spark = Bench.buildSession(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val spinRegStart = Bench.cpuSpinReg()
    val spinMemStart = Bench.cpuSpinMem()

    def minSec(warm: Int = 3)(body: => Unit): Double = {
      (1 to warm).foreach(_ => body)
      (1 to passes).map { _ =>
        val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
      }.min
    }

    // rung 1: one-stage action, no IO, no shuffle, no AQE re-plan
    val job = minSec() { spark.range(32).selectExpr("sum(id)").collect() }
    // rung 2: the same plus ONE shuffle stage (partial agg → exchange →
    // final agg); under AQE this is also one extra re-plan round-trip
    val twoStage = minSec() {
      spark.range(32).groupBy(col("id") % 4).count().collect()
    }
    // rung 3: smallest real parquet scan at the probed sf
    val docs = core.Tables(spark, sfDir, "documents")
    val scan = minSec() { docs.select(count(lit(1))).collect() }
    // rung 4: a representative tiny gate-query shape
    val query = minSec() {
      docs.filter(length(col("text")) > 0)
        .groupBy(col("lang")).agg(count(lit(1))).collect()
    }

    val spinRegEnd = Bench.cpuSpinReg()
    val spinMemEnd = Bench.cpuSpinMem()
    val quiet = math.max(spinRegStart, spinRegEnd) <= Bench.spinRegFlag &&
      math.max(spinMemStart, spinMemEnd) <= Bench.spinMemFlag
    println(s"""{"metric":"floor_probe","sf":"$sfDir","passes":$passes,""" +
      s""""job_floor_sec":$job,"stage_floor_sec":${twoStage - job},""" +
      s""""two_stage_sec":$twoStage,"scan_floor_sec":$scan,""" +
      s""""query_floor_sec":$query,""" +
      s""""spin_reg_start_sec":$spinRegStart,"spin_mem_start_sec":$spinMemStart,""" +
      s""""spin_reg_end_sec":$spinRegEnd,"spin_mem_end_sec":$spinMemEnd,""" +
      s""""probe_quiet":$quiet}""")
    spark.stop()
  }
}
