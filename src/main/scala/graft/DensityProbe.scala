package graft

import org.apache.spark.sql.functions._

/** Dev tool: measure the near-dup / semantic-dedup family under the
  * DENSITY-CONSTANT scaling regime (a `ScaleUp … distinct` surface, where
  * true dup pairs grow ∝ n rather than the dense surface's ∝ n·factor).
  *
  * `factor` is the distinct-mode replication factor of the surface
  * relative to the base corpus (1 for the base itself). t06's DF cap is a
  * corpus-FRACTION statistic, so the cap is scaled by 1/factor: under the
  * bijective word rename every gram family keeps its base document count
  * while the corpus is factor× larger, and cap/factor reproduces each
  * per-replica capped gram set bit-for-bit (ScaleUp's scaladoc records
  * the 206 → 33.9 M blow-up of measuring with the UNscaled cap). The
  * cap-free operators — t36 shingle LSH and s12 scaled semantic dedup
  * (k ∝ n, the embedding-side probe) — run unmodified.
  *
  * The whole set runs TWICE and the SECOND pass is reported: a fresh JVM's
  * first query absorbs all JIT/codegen/classload cost (~5–7 s), which at
  * the small base surface dominates the measurement and flattens every
  * cross-surface runtime ratio (found in review — the first published
  * table had t06 "8.8 s" at base where warm work is ~2 s).
  *
  * Usage: DensityProbe <sfDir> <factor> [skip_s12] [nowarm]   (one JSON line)
  * `skip_s12` exists for surfaces where s12's cost is dominated by the
  * O(n·k·d) centroid-assignment pass (factor 1000: k = 8000 over 20 M
  * vectors ≈ 10¹³ MACs per pass) — there the warmup double-run buys
  * nothing, so s12 is measured once via graft.BenchOne instead.
  */
object DensityProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val factor = args(1).toInt
    // flags after <factor>: skip_s12 (see scaladoc) and nowarm (skip the
    // warmup pass — for surfaces whose gram shuffle is large enough that
    // the warmup pass's not-yet-GC'd shuffle files DOUBLE the peak disk
    // footprint; at the ≥15 s runtimes such surfaces imply, the JIT
    // constant the warmup removes is relative noise). A misspelled flag
    // must fail in milliseconds, not silently run the ~10^13-MAC s12
    // pass twice on the very surface skip_s12 exists for.
    val flags = args.drop(2).toSet
    val skipS12 = flags.contains("skip_s12")
    val noWarm = flags.contains("nowarm")
    require((flags -- Set("skip_s12", "nowarm")).isEmpty,
      s"unknown argument(s): ${(flags -- Set("skip_s12", "nowarm")).mkString(" ")}")
    val spark = Bench.buildSession(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    // host-speed probes bracket the run (r15): decade TIMES are only
    // citable from probe-quiet windows — the r14 t36-1000× rows were cut
    // at start loadavg 12–15 and burned a round on attribution
    val spinRegStart = Bench.cpuSpinReg()
    val spinMemStart = Bench.cpuSpinMem()
    val docs = graft.core.Tables(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))

    def timed[A](body: => (Long, A)): (Double, Long, A) = {
      val t0 = System.nanoTime()
      val (n, a) = body
      ((System.nanoTime() - t0) / 1e9, n, a)
    }

    def pass() = {
      // t06 shape, cap scaled with the corpus. The pair frame is PERSISTED
      // inside the t06 timer (compute + cache is t06's reported cost) so
      // the t11 timer below measures connected components only — an
      // uncached frame would silently re-run the whole jaccardPairs job
      // inside t11's timed block and skew the cross-surface ratios
      val (t06Sec, t06Pairs, pairs) = timed {
        val p = graft.operators.NearDup.jaccardPairs(
          docs, gramLen = 4, capNum = 1, capDen = 10 * factor,
          tNum = 4, tDen = 5).persist()
        (p.count(), p)
      }
      // t11 shape over those pairs
      val (t11Sec, t11Rows, _) = timed {
        val labels = graft.operators.Graph.connectedComponents(
          pairs.select(col("a_id"), col("b_id")))
        (labels.count(), ())
      }
      pairs.unpersist()
      // t36 shape (cap-free)
      val (t36Sec, t36Pairs, _) = timed {
        (graft.operators.NearDup.selfMinHashPairs(docs).count(), ())
      }
      // s12 shape (cap-free: k ∝ n) — the embedding-side density probe;
      // its removal count is the direct "semantic dups ∝ n" statistic
      val (s12Sec, s12Rows, _) =
        if (skipS12) (-1.0, -1L, ())
        else timed {
          (SparkEntry.queries("s12_semdedup_scaled")(spark, sfDir).count(), ())
        }
      (t06Sec, t06Pairs, t11Sec, t11Rows, t36Sec, t36Pairs, s12Sec, s12Rows)
    }

    if (!noWarm) pass() // warmup — see scaladoc
    val (t06Sec, t06Pairs, t11Sec, t11Rows,
      t36Sec, t36Pairs, s12Sec, s12Rows) = pass()
    val spinRegEnd = Bench.cpuSpinReg()
    val spinMemEnd = Bench.cpuSpinMem()
    println(s"""{"metric":"density_probe","sf":"$sfDir","factor":$factor,""" +
      s""""t06_sec":$t06Sec,"t06_pairs":$t06Pairs,""" +
      s""""t11_sec":$t11Sec,"t11_rows":$t11Rows,""" +
      s""""t36_sec":$t36Sec,"t36_pairs":$t36Pairs,""" +
      s""""s12_sec":$s12Sec,"s12_removed":$s12Rows,""" +
      s""""spin_reg_start_sec":$spinRegStart,"spin_mem_start_sec":$spinMemStart,""" +
      s""""spin_reg_end_sec":$spinRegEnd,"spin_mem_end_sec":$spinMemEnd}""")
    spark.stop()
  }
}
