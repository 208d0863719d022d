package graft.plans

import graft.SparkSpec
import graft.operators.Relational
import org.apache.spark.sql.catalyst.plans.logical.Filter
import org.apache.spark.sql.functions._

/** The as-of optimizer rules must (a) preserve results exactly, (b) move
  * filters written above the custom node into both children so they reach
  * the parquet scans' PushedFilters, and (c) prune payload columns a
  * downstream projection ignores out of the scans' ReadSchema. */
class AsofOptimizationSpec extends SparkSpec {
  import spark.implicits._

  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("asof_opt").toString
    (0 until 400).map(i => (i.toLong % 10, (i * 37 % 1000).toLong, s"l$i", i.toLong))
      .toDF("k", "lt", "l_val", "extra_l").write.mode("overwrite").parquet(s"$d/left")
    (0 until 120).map(i => (i.toLong % 8, (i * 83 % 997).toLong, i.toLong, s"r$i"))
      .toDF("k", "rt", "r_val", "extra_r")
      .groupBy("k", "rt").agg(max("r_val").as("r_val"), max("extra_r").as("extra_r"))
      .write.mode("overwrite").parquet(s"$d/right")
    d
  }

  private def query = {
    val l = spark.read.parquet(s"$dir/left")
    val r = spark.read.parquet(s"$dir/right")
    AsofJoin.asof(l, r, Seq("k"), "lt", "rt")
      .filter(col("k") < 5 && col("l_val") =!= "l13")
      .select(col("k"), col("lt"), col("r_val"))
  }

  private def finalPlan(df: org.apache.spark.sql.DataFrame): String = {
    // scan metadata (PushedFilters/DataFilters) is truncated at 100 chars by
    // default, which would hide pushed predicates from the assertions below
    spark.conf.set("spark.sql.maxMetadataStringLength", "2000")
    df.collect()
    df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan.toString
      case p => p.toString
    }
  }

  test("pushdown + pruning preserve results exactly") {
    val l = spark.read.parquet(s"$dir/left")
    val r = spark.read.parquet(s"$dir/right").drop("extra_r")
    val expected = Relational.asofJoin(l.drop("extra_l"), r, Seq("k"), "lt", "rt")
      .filter(col("k") < 5 && col("l_val") =!= "l13")
      .select(col("k"), col("lt"), col("r_val"))
      .as[(Long, Long, Option[Long])].collect().toSeq.sorted
    val got = query.as[(Long, Long, Option[Long])].collect().toSeq.sorted
    assert(got == expected && got.size == 199) // 200 k<5 rows minus l13
  }

  test("filter written above the node lands inside both children") {
    val opt = query.queryExecution.optimizedPlan
    // no Filter remains above the as-of node...
    val above = opt.collect {
      case f: Filter if f.find(_.isInstanceOf[AsofJoinNode]).isDefined => f
    }
    assert(above.isEmpty, s"filter not pushed:\n$opt")
    val node = opt.collect { case a: AsofJoinNode => a }.head
    // ...the full predicate sits in the left subtree...
    assert(node.left.collectFirst { case f: Filter => f }.isDefined, s"no left filter:\n$opt")
    // ...and the key-only predicate was mirrored into the right subtree
    assert(node.right.collectFirst { case f: Filter => f }.isDefined, s"no right filter:\n$opt")
  }

  test("key predicate reaches BOTH parquet scans' PushedFilters") {
    val plan = finalPlan(query)
    val pushed = "LessThan\\(k,5\\)".r.findAllIn(plan).size
    assert(pushed == 2, s"expected the key predicate in both scans, got $pushed:\n$plan")
    // the left-only string predicate must NOT leak into the right scan: its
    // pushed form appears exactly once (the left scan)
    val stringPred = "Not\\(EqualTo\\(l_val,l13\\)\\)".r.findAllIn(plan).size
    assert(stringPred == 1, s"left-only predicate must reach exactly one scan:\n$plan")
  }

  test("unused payload columns are pruned out of both scans") {
    val plan = finalPlan(query)
    // extra_l (left payload) and extra_r (right payload) are never referenced
    // above the join -> the pruning rule narrows both children, and Catalyst
    // carries that down to ReadSchema; l_val IS referenced (by the filter)
    assert(!plan.contains("extra_l"), s"left payload not pruned:\n$plan")
    assert(!plan.contains("extra_r"), s"right payload not pruned:\n$plan")
    assert(plan.contains("l_val"), s"filter-referenced column over-pruned:\n$plan")
  }

  test("negative case: a predicate over right payload stays above the node") {
    val l = spark.read.parquet(s"$dir/left")
    val r = spark.read.parquet(s"$dir/right")
    val q = AsofJoin.asof(l, r, Seq("k"), "lt", "rt")
      // references the nullable right payload: NOT pushable (pushing it
      // into the right child would turn unmatched-null rows into drops)
      .filter(col("r_val") > 50 && col("k") < 5)
      .select(col("k"), col("lt"), col("r_val"))
    val opt = q.queryExecution.optimizedPlan
    val above = opt.collect {
      case f: Filter if f.find(_.isInstanceOf[AsofJoinNode]).isDefined => f
    }
    // the r_val conjunct must remain above the node...
    assert(above.nonEmpty && above.head.condition.references.map(_.name).toSet == Set("r_val"),
      s"right-payload predicate must not push:\n$opt")
    // ...while the k < 5 key conjunct still pushed into both children
    val node = opt.collect { case a: AsofJoinNode => a }.head
    assert(node.left.collectFirst { case f: Filter => f }.isDefined)
    assert(node.right.collectFirst { case f: Filter => f }.isDefined)
    // semantics: matches the composed form with the same post-filter
    val expected = Relational.asofJoin(l.drop("extra_l"), r.drop("extra_r"),
        Seq("k"), "lt", "rt")
      .filter(col("r_val") > 50 && col("k") < 5)
      .select(col("k"), col("lt"), col("r_val"))
      .as[(Long, Long, Option[Long])].collect().toSeq.sorted
    val got = q.as[(Long, Long, Option[Long])].collect().toSeq.sorted
    assert(got == expected && got.nonEmpty)
  }

  test("pushdown through the node composes with the window in e07's shape") {
    // right side behind a row_number window (Relational.latest): the mirrored
    // key filter must still flow through the window to the scan
    val ev = graft.core.Tables.events(spark, sfSmoke)
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("p_event_id"),
        col("ts").as("p_ts"), col("value").as("p_value"))
    val c = Relational.latest(
      ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("event_id").as("c_event_id"),
          col("ts").as("c_ts")),
      Seq("user_id", "c_ts"), Seq("c_event_id"))
    val q = AsofJoin.asof(p, c, Seq("user_id"), "p_ts", "c_ts")
      .filter(col("user_id") < 8 && col("p_value") > 100.0)
      .select(col("user_id"), col("p_event_id"), col("p_ts"), col("c_ts"))
    val plan = finalPlan(q)
    val pushed = "LessThan\\(user_id,8\\)".r.findAllIn(plan).size
    assert(pushed == 2, s"key predicate should reach both scans through the window:\n$plan")
    // and the same query agrees with the composed form
    val composed = Relational.asofJoin(p, c, Seq("user_id"), "p_ts", "c_ts")
      .filter(col("user_id") < 8 && col("p_value") > 100.0)
      .select(col("user_id"), col("p_event_id"), col("p_ts"), col("c_ts"))
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.get(2).toString, Option(r.get(3)).map(_.toString))
    assert(q.collect().map(key).toSet == composed.collect().map(key).toSet)
    assert(q.count() > 0)
  }
}
