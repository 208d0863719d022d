package graft

import java.nio.file.{Files, Path}
import org.scalatest.funsuite.AnyFunSuite

/** Pins [[Bench.writeArtifact]]'s record-protection contract (no Spark
  * session needed — pure file logic):
  *
  *   - a quiet cut always lands at the record path;
  *   - a probe-flagged cut is diverted to `.flagged` when the record path
  *     already holds a proven-quiet artifact, even WITHOUT record mode —
  *     the r15 hole: a casual degraded-window `graft.Bench` run clobbered
  *     the quiet `rounds/BENCH_full_latest_sf0.1.json` because the divert
  *     only fired under SPARK_GRAFT_RECORD=1;
  *   - a flagged cut may still replace a flagged/unproven one (freshness
  *     on a host whose degraded mode lasts whole days beats staleness).
  *
  * Record MODE (the env-gated wait-for-quiet path) is exercised by the
  * rebuild scripts; this spec covers the always-on file-level guard.
  */
class BenchArtifactSpec extends AnyFunSuite {

  private def withDir(f: Path => Unit): Unit = {
    val d = Files.createTempDirectory("bench_artifact")
    try f(d)
    finally {
      d.toFile.listFiles().foreach(_.delete()); Files.deleteIfExists(d)
    }
  }

  private def read(p: Path): String = new String(Files.readAllBytes(p), "UTF-8").trim

  private val quietJson   = """{"metric":"total","value":1.0,"probe_quiet":true}"""
  private val flaggedJson = """{"metric":"total","value":9.0,"probe_quiet":false}"""

  test("quiet cut lands at the record path") {
    withDir { d =>
      val p = d.resolve("BENCH.json").toString
      Bench.writeArtifact(quietJson, p)
      assert(read(d.resolve("BENCH.json")) == quietJson)
      assert(!Files.exists(d.resolve("BENCH.json.flagged")))
    }
  }

  test("flagged cut cannot clobber a proven-quiet record, even without record mode") {
    withDir { d =>
      val p = d.resolve("BENCH.json").toString
      Bench.writeArtifact(quietJson, p)
      Bench.writeArtifact(flaggedJson, p)
      assert(read(d.resolve("BENCH.json")) == quietJson,
        "quiet record must survive a flagged overwrite attempt")
      assert(read(d.resolve("BENCH.json.flagged")) == flaggedJson,
        "flagged cut must still be preserved at the .flagged path")
    }
  }

  test("flagged cut may replace a flagged or unproven record") {
    withDir { d =>
      val p = d.resolve("BENCH.json").toString
      // pre-gate artifact: no probe_quiet field at all
      Files.write(d.resolve("BENCH.json"), """{"metric":"total","value":5.0}""".getBytes("UTF-8"))
      Bench.writeArtifact(flaggedJson, p)
      assert(read(d.resolve("BENCH.json")) == flaggedJson,
        "an unproven record does not block a fresher (still flagged) cut")
      Bench.writeArtifact(flaggedJson.replace("9.0", "8.0"), p)
      assert(read(d.resolve("BENCH.json")).contains("8.0"),
        "flagged-over-flagged keeps freshness")
    }
  }
}
