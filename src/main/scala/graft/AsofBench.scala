package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Measures the e05-vs-e06 as-of tradeoff instead of asserting it — the one
  * scale argument PERF.md previously carried from byte math alone.
  *
  * The claim under test: the composed union+window form
  * ([[graft.operators.Relational.asofJoin]]) pads every row to the COMBINED
  * schema before its single shuffle, so its shuffle bytes grow with total
  * payload width, while the native sorted-merge exec
  * ([[graft.plans.AsofJoin]]) shuffles each side at its own narrow width
  * (two exchanges, fewer bytes once the pad dominates). If that argument is
  * real, widening the payload should move the crossover toward the native
  * form much faster than adding rows does — so the harness sweeps BOTH axes:
  * row factor (events replicated with fresh users per replica, the e05
  * shape) and payload width (extra non-constant doubles per side).
  *
  * Methodology notes:
  *  - purchases / deduped clicks are PRE-MATERIALIZED to parquet per factor,
  *    so both measured plans are scan → as-of → consume and the shared prep
  *    (filter + latest()) is outside the timer;
  *  - the consuming action is sum(hash(every output column)), NOT count():
  *    under count() Catalyst prunes the payload columns on both plans and
  *    the measurement would time two payload-free joins — the exact bytes
  *    the claim is about;
  *  - warmup pass + min-of-3, same session config as [[Bench]].
  *
  * Usage: AsofBench [factorsCsv] [padWidthsCsv]
  * Prints one JSON line per (factor, padWidth) cell.
  */
object AsofBench {

  def main(args: Array[String]): Unit = {
    val factors = (if (args.length > 0) args(0) else "10,30,100")
      .split(",").map(_.trim.toInt).toSeq
    val pads = (if (args.length > 1) args(1) else "0,12")
      .split(",").map(_.trim.toInt).toSeq
    val base = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Bench.buildSession(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))

    def pad(df: DataFrame, pfx: String, n: Int, seed: Column): DataFrame =
      (0 until n).foldLeft(df)((d, i) =>
        d.withColumn(s"${pfx}_pad$i", (seed * (i + 1)).cast("double")))

    def prep(factor: Int, padWidth: Int): (DataFrame, DataFrame) = {
      val dir = s"/tmp/asof_bench/f${factor}_w$padWidth"
      // check the LAST-written artifact: a run killed between the two
      // writes must rebuild, not half-read a stale cache
      if (!new java.io.File(s"$dir/c.parquet/_SUCCESS").exists()) {
        val ev = graft.core.Tables(spark, base, "events")
          .crossJoin(spark.range(factor).select(col("id").as("__r")))
          .withColumn("event_id", col("event_id") + col("__r") * 1000000000L)
          .withColumn("user_id", col("user_id") + col("__r") * 1000000000L)
          .drop("__r")
        val p = pad(
          ev.filter(col("event_type") === "purchase")
            .select(col("user_id"), col("event_id").as("p_event_id"),
              col("ts").as("p_ts"), col("value").as("p_value")),
          "p", padWidth, col("p_event_id"))
        val c = pad(
          graft.operators.Relational.latest(
            ev.filter(col("event_type") === "click")
              .select(col("user_id"), col("event_id").as("c_event_id"),
                col("ts").as("c_ts")),
            Seq("user_id", "c_ts"), Seq("c_event_id")),
          "c", padWidth, col("c_event_id"))
        p.write.mode("overwrite").parquet(s"$dir/p.parquet")
        c.write.mode("overwrite").parquet(s"$dir/c.parquet")
      }
      (spark.read.parquet(s"$dir/p.parquet"), spark.read.parquet(s"$dir/c.parquet"))
    }

    // consume every output column so neither plan gets its payload pruned
    def consume(df: DataFrame): Long = {
      val h = hash(df.columns.toIndexedSeq.map(col): _*)
      df.select(sum(h.cast("long")).as("s")).collect()(0).getLong(0)
    }

    def timeMin3(mk: () => DataFrame): (Double, Long) = {
      consume(mk()) // warmup
      var best = Double.MaxValue
      var check = 0L
      for (_ <- 1 to 3) {
        val t0 = System.nanoTime()
        check = consume(mk())
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
      }
      (best, check)
    }

    for (f <- factors; w <- pads) {
      val (p, c) = prep(f, w)
      val rows = p.count() + c.count()
      val (tComposed, hComposed) = timeMin3(() =>
        graft.operators.Relational.asofJoin(p, c, Seq("user_id"), "p_ts", "c_ts"))
      val (tNative, hNative) = timeMin3(() =>
        graft.plans.AsofJoin.asof(p, c, Seq("user_id"), "p_ts", "c_ts"))
      // both forms implement identical semantics; the checksum crossing the
      // full output schema must agree or the timing comparison is void
      val agree = hComposed == hNative
      println(s"""{"shape":"both_grow","factor":$f,"pad":$w,"rows":$rows,""" +
        s""""composed_sec":$tComposed,"native_sec":$tNative,"checksums_agree":$agree}""")
    }

    // attach shape: the fact side grows with the factor, the history side
    // stays fixed (price/rate attach) — the broadcast form's domain. Note
    // users only overlap within replica 0 here (scaled purchases carry
    // offset user ids), which is exactly the sparse-match regime a fixed
    // dim implies; all three forms face the same inputs.
    for (f <- factors; w <- pads) {
      val (p, _) = prep(f, w)
      val (_, c) = prep(1, w)
      val rows = p.count() + c.count()
      val (tComposed, hComposed) = timeMin3(() =>
        graft.operators.Relational.asofJoin(p, c, Seq("user_id"), "p_ts", "c_ts"))
      val (tNative, hNative) = timeMin3(() =>
        graft.plans.AsofJoin.asof(p, c, Seq("user_id"), "p_ts", "c_ts"))
      val (tBcast, hBcast) = timeMin3(() =>
        graft.operators.Relational.asofJoinBroadcast(
          p, c, Seq("user_id"), "p_ts", "c_ts"))
      val agree = hComposed == hNative && hComposed == hBcast
      println(s"""{"shape":"attach","factor":$f,"pad":$w,"rows":$rows,""" +
        s""""composed_sec":$tComposed,"native_sec":$tNative,""" +
        s""""broadcast_sec":$tBcast,"checksums_agree":$agree}""")
    }
    spark.stop()
  }
}
