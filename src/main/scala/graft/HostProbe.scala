package graft

/** One-shot host-speed reading: prints a single JSON line with loadavg and
  * the two JVM spin probes [[Bench.cpuSpinReg]] / [[Bench.cpuSpinMem]],
  * plus whether that reading passes the record-gate thresholds. Used to
  * decide — before committing to a 3–30 min artifact-of-record cut —
  * whether the window is quiet, and to accumulate ad-hoc baseline
  * readings between rounds (PERF.md "host-speed probes"). No SparkSession:
  * the probes are plain JVM loops, so this answers in ~3 s.
  */
object HostProbe {
  def main(args: Array[String]): Unit = {
    val load =
      try scala.io.Source.fromFile("/proc/loadavg").mkString
        .split("\\s+").take(2).toSeq
      catch { case _: Exception => Seq("-1", "-1") }
    // steal is measured ACROSS the two spins: they keep exactly one core
    // busy, so steal-of-busy reads the hypervisor's cut of a core this
    // guest is actively trying to use (r15: ~30-50% in the degraded mode
    // at loadavg 0.1 — the smoking gun the spins could only infer)
    val ((reg, mem), steal) = Bench.stealPctBusy {
      (Bench.cpuSpinReg(), Bench.cpuSpinMem())
    }
    val quiet = reg <= Bench.spinRegFlag && mem <= Bench.spinMemFlag
    println(s"""{"metric":"host_probe","loadavg_1m_5m":[${load.mkString(",")}],""" +
      s""""spin_reg_sec":$reg,"spin_mem_sec":$mem,""" +
      f""""steal_pct_busy":$steal%.1f,"probe_quiet":$quiet,""" +
      s""""probe_flags":{"reg":${Bench.spinRegFlag},"mem":${Bench.spinMemFlag}}}""")
  }
}
