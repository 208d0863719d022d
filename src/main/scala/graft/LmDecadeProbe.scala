package graft

import org.apache.spark.sql.functions._

/** Dev tool: the decade-ladder proof for the two heavy TRAINED text
  * scorers — t24 (bigram-LM perplexity filter) and t35 (Naive-Bayes
  * langid + confusion matrix) — over the DENSITY-CONSTANT surfaces
  * (`ScaleUp … distinct`), closing the r14 verdict's ask #4: these are
  * top-10 SF10 queries that had no 1/10/100/1000× linearity evidence
  * like t06/t11/t36/s12 carry in DENSITY.json.
  *
  * Why the counts track factor-linearity on a distinct surface: the
  * per-replica word rename keeps every replica's bigram table (c12/c1)
  * and per-lang token counts equal to the base corpus's where the rename
  * is collision-free, so n_docs and Σ n_bigrams are EXACTLY factor ×
  * base (they depend only on doc lengths — measured exact at all three
  * decades), t35's confusion matrix is cell-by-cell factor × base (the
  * smoothing denominators scale by exactly `factor`, shifting every
  * per-token log-prob by the same −ln(factor) across model langs —
  * measured exact at 10/100, and at 1000 consistent up to the
  * DENSITY.json-documented cipher-saturation collision tail), and
  * t24's Σ sum_q deviates only by the collision density (measured
  * 0.0013%/0.86%/2.8% at 10/100/1000 — cross-replica collisions make a
  * few words shared, shifting their probabilities). The probe prints the
  * full matrix so the cross-decade compare is cell-by-cell, not a
  * summary that could hide compensating drift.
  *
  * Same double-run protocol as DensityProbe: the set runs twice and the
  * SECOND pass is reported (the first absorbs JIT/codegen/classload —
  * at base scale that cost dominates and flattens cross-surface ratios).
  * `nowarm` skips the warmup for the big surfaces where the shuffle
  * footprint of a double run costs more than the JIT constant is worth.
  *
  * Usage: LmDecadeProbe <sfDir> <factor> [nowarm]   (one JSON line)
  */
object LmDecadeProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val factor = args(1).toInt
    val flags = args.drop(2).toSet
    require((flags -- Set("nowarm")).isEmpty,
      s"unknown argument(s): ${(flags -- Set("nowarm")).mkString(" ")}")
    val noWarm = flags.contains("nowarm")
    val spark = Bench.buildSession(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    // host-speed probes bracket the run: decade TIMES are only citable
    // from windows whose probes read quiet (r14's t36-1000× lesson)
    val spinRegStart = Bench.cpuSpinReg()
    val spinMemStart = Bench.cpuSpinMem()

    def pass() = {
      val t24T0 = System.nanoTime()
      val t24 = SparkEntry.queries("t24_bigram_lm_score")(spark, sfDir)
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_bigrams")).as("sum_nb"),
          sum(col("sum_q")).as("sum_q"))
        .head()
      val t24Sec = (System.nanoTime() - t24T0) / 1e9
      val t35T0 = System.nanoTime()
      val cells = SparkEntry.queries("t35_nb_langid")(spark, sfDir)
        .orderBy(col("true_lang"), col("predicted"))
        .collect()
        .map(r => s"${r.getString(0)}>${r.getString(1)}:${r.getLong(2)}")
      val t35Sec = (System.nanoTime() - t35T0) / 1e9
      (t24Sec, t24.getLong(0), t24.getLong(1), t24.getLong(2),
        t35Sec, cells.mkString(","))
    }

    if (!noWarm) pass()
    val (t24Sec, nDocs, sumNb, sumQ, t35Sec, cells) = pass()
    val spinRegEnd = Bench.cpuSpinReg()
    val spinMemEnd = Bench.cpuSpinMem()
    println(s"""{"metric":"lm_decade_probe","sf":"$sfDir","factor":$factor,""" +
      s""""t24_sec":$t24Sec,"t24_docs":$nDocs,"t24_bigrams":$sumNb,""" +
      s""""t24_sum_q":$sumQ,""" +
      s""""t35_sec":$t35Sec,"t35_cells":"$cells",""" +
      s""""spin_reg_start_sec":$spinRegStart,"spin_mem_start_sec":$spinMemStart,""" +
      s""""spin_reg_end_sec":$spinRegEnd,"spin_mem_end_sec":$spinMemEnd}""")
    spark.stop()
  }
}
