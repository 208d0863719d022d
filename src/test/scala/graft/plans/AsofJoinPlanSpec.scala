package graft.plans

import graft.SparkSpec
import graft.operators.Relational
import org.apache.spark.sql.functions._

/** The native as-of operator must agree exactly with the composed
  * union+window form (Relational.asofJoin) — including unmatched lefts,
  * empty right groups, and boundary equality (right time == left time) —
  * and its physical plan must be the custom exec fed by two exchanges. */
class AsofJoinPlanSpec extends SparkSpec {
  import spark.implicits._

  // deterministic corpus: keys 0..9, left times spread, right times sparse;
  // (key, time) unique on the right so the as-of pick is total-order stable
  private def corpus = {
    val left = (0 until 400).map { i =>
      (i.toLong % 10, (i * 37 % 1000).toLong, s"l$i")
    }.toDF("k", "lt", "l_val")
    val right = (0 until 120).map { i =>
      (i.toLong % 8, (i * 83 % 997).toLong, i.toLong)
    }.distinct.map { case (k, t, v) => (k, t, v) }
      .toDF("k", "rt", "r_val")
      // keep-max-id at identical (k, rt) -> deterministic pick
      .groupBy("k", "rt").agg(max("r_val").as("r_val"))
    (left, right)
  }

  test("native as-of equals the composed union+window form") {
    val (left, right) = corpus
    val native = AsofJoin.asof(left, right, Seq("k"), "lt", "rt")
      .select("k", "lt", "l_val", "rt", "r_val")
      .as[(Long, Long, String, Option[Long], Option[Long])].collect().toSet
    val composed = Relational.asofJoin(left, right, Seq("k"), "lt", "rt")
      .select("k", "lt", "l_val", "rt", "r_val")
      .as[(Long, Long, String, Option[Long], Option[Long])].collect().toSet
    assert(native == composed)
    assert(native.size == 400) // every left row exactly once
    assert(native.exists(_._4.isEmpty)) // keys 8,9 have no right rows
    assert(native.exists(_._4.nonEmpty))

    // third, independent witness: a plain-Scala scan over the same corpus
    val rightRows = right.as[(Long, Long, Long)].collect()
      .groupBy(_._1).map { case (k, xs) => k -> xs.sortBy(_._2) }
    val scalar = left.as[(Long, Long, String)].collect().map { case (k, lt, lv) =>
      val m = rightRows.getOrElse(k, Array.empty[(Long, Long, Long)])
        .filter(_._2 <= lt).lastOption
      (k, lt, lv, m.map(_._2), m.map(_._3))
    }.toSet
    assert(native == scalar)
  }

  test("boundary semantics: right time == left time matches (inclusive)") {
    val left = Seq((1L, 100L, "a"), (1L, 99L, "b"), (2L, 5L, "c"))
      .toDF("k", "lt", "l_val")
    val right = Seq((1L, 100L, 7L), (1L, 50L, 3L)).toDF("k", "rt", "r_val")
    val got = AsofJoin.asof(left, right, Seq("k"), "lt", "rt")
      .select("k", "lt", "rt", "r_val")
      .as[(Long, Long, Option[Long], Option[Long])].collect().toSet
    assert(got == Set(
      (1L, 100L, Some(100L), Some(7L)), // inclusive boundary
      (1L, 99L, Some(50L), Some(3L)),
      (2L, 5L, None, None)))
  }

  test("null times never match but left rows survive") {
    val left = Seq((1L, Some(10L), "a"), (1L, None, "b")).toDF("k", "lt", "l_val")
    val right = Seq((1L, Some(5L), 1L), (1L, None, 99L)).toDF("k", "rt", "r_val")
    val got = AsofJoin.asof(left, right, Seq("k"), "lt", "rt")
      .select("l_val", "r_val").as[(String, Option[Long])].collect().toSet
    assert(got == Set(("a", Some(1L)), ("b", None)))
  }

  test("plan: custom exec with one exchange per side, sorted inputs") {
    val (left, right) = corpus
    val df = AsofJoin.asof(left, right, Seq("k"), "lt", "rt")
    df.collect()
    // unwrap AQE so the assertions see only the FINAL plan (the adaptive
    // wrapper prints the initial plan too, double-counting exchanges)
    val plan = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan.toString
      case p => p.toString
    }
    assert(plan.contains("AsofJoin ["), s"custom exec missing:\n$plan")
    // exactly one single-key co-partitioning exchange per side (the right
    // side's dedup groupBy contributes its own two-key exchange)
    val keyExchanges =
      """Exchange hashpartitioning\(k#\d+L, \d+\)""".r.findAllIn(plan).size
    assert(keyExchanges == 2, s"expected 2 key exchanges, got $keyExchanges:\n$plan")
    // each side is sorted by (key, time) below the operator, never globally
    assert(!plan.contains("rangepartitioning"), s"global sort leaked:\n$plan")
  }

  test("native as-of reproduces e05's purchase<-click enrichment") {
    // ts normalized by the central dtype dispatch, like EventQueries
    val ev = graft.core.Tables.events(spark, sfSmoke)
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("p_event_id"),
        col("ts").as("p_ts"))
    val c = Relational.latest(
      ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("event_id").as("c_event_id"),
          col("ts").as("c_ts")),
      Seq("user_id", "c_ts"), Seq("c_event_id"))
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), Option(r.get(3)).map(_.toString))
    val native = AsofJoin.asof(p, c, Seq("user_id"), "p_ts", "c_ts")
      .select("user_id", "p_event_id", "p_ts", "c_ts", "c_event_id")
      .collect().map(key).toSet
    val composed = Relational.asofJoin(p, c, Seq("user_id"), "p_ts", "c_ts")
      .select("user_id", "p_event_id", "p_ts", "c_ts", "c_event_id")
      .collect().map(key).toSet
    assert(native == composed && native.nonEmpty)
  }
}
