package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance: merge must be lossless (equal to the
  * from-scratch build), order-free, and the warehouse fold must rewrite only
  * touched partitions. */
class IncrementalSpec extends SparkSpec {
  import spark.implicits._

  private val group = Seq("mon", "k")

  private def facts: DataFrame = Seq(
    // (mon, k, amount)
    ("2024-01", "a", 10.00), ("2024-01", "a", 20.50), ("2024-01", "b", 5.25),
    ("2024-02", "a", 7.75), ("2024-02", "b", 0.10), ("2024-02", "b", 99.99),
    ("2024-03", "a", 42.00)
  ).toDF("mon", "k", "amount")

  private def batch(df: DataFrame): DataFrame =
    Incremental.finalize(
      Incremental.partials(df, group, col("amount")))

  private def sortedRows(df: DataFrame): Seq[String] =
    df.orderBy(group.map(col): _*).collect().map(_.toString).toSeq

  test("merge of slice partials equals the from-scratch build") {
    val byMonth = Seq("2024-01", "2024-02", "2024-03").map(m =>
      Incremental.partials(facts.filter(col("mon") === m), group, col("amount")))
    val merged = Incremental.finalize(Incremental.merge(group, byMonth: _*))
    assert(sortedRows(merged) == sortedRows(batch(facts)))
  }

  test("merge is associative and commutative (any arrival order)") {
    val Seq(p1, p2, p3) = Seq("2024-01", "2024-02", "2024-03").map(m =>
      Incremental.partials(facts.filter(col("mon") === m), group, col("amount")))
    val leftFold = Incremental.merge(group, Incremental.merge(group, p1, p2), p3)
    val reversed = Incremental.merge(group, p3, Incremental.merge(group, p2, p1))
    assert(sortedRows(Incremental.finalize(leftFold)) ==
      sortedRows(Incremental.finalize(reversed)))
  }

  test("finalize derives exact avg and population variance") {
    val out = batch(facts.filter(col("mon") === "2024-01" && col("k") === "a"))
      .collect().head
    // values 10.00, 20.50 → n=2, sum=3050c, min=1000c, max=2050c
    assert(out.getAs[Long]("n") == 2L)
    assert(out.getAs[Long]("sum_c") == 3050L)
    assert(out.getAs[Long]("min_c") == 1000L)
    assert(out.getAs[Long]("max_c") == 2050L)
    assert(approx(out.getAs[Double]("avg_amt"), 15.25))
    // pop var of (10.00, 20.50) = ((10-15.25)^2 + (20.5-15.25)^2)/2 = 27.5625
    assert(approx(out.getAs[Double]("var_amt"), 27.5625))
  }

  test("refreshState folds month slices and rewrites only touched partitions") {
    val path = java.nio.file.Files.createTempDirectory("inc_state").toString
    Seq("2024-01", "2024-02").foreach { m =>
      Incremental.refreshState(spark, path,
        Incremental.partials(facts.filter(col("mon") === m), group, col("amount")),
        group, "mon")
    }
    val janFileBefore = new java.io.File(path, "mon=2024-01").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getName).toSet
    // third slice touches only 2024-03
    Incremental.refreshState(spark, path,
      Incremental.partials(facts.filter(col("mon") === "2024-03"), group, col("amount")),
      group, "mon")
    val janFileAfter = new java.io.File(path, "mon=2024-01").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getName).toSet
    assert(janFileBefore == janFileAfter, "untouched partition was rewritten")
    val served = Incremental.finalize(spark.read.parquet(path))
      .select("mon", "k", "n", "sum_c", "min_c", "max_c", "avg_amt", "var_amt")
    val expected = batch(facts)
      .select("mon", "k", "n", "sum_c", "min_c", "max_c", "avg_amt", "var_amt")
    assert(sortedRows(served) == sortedRows(expected))
  }

  test("a late-arriving correction to an old month folds in without a rescan") {
    val path = java.nio.file.Files.createTempDirectory("inc_late").toString
    Incremental.refreshState(spark, path,
      Incremental.partials(facts, group, col("amount")), group, "mon")
    val late = Seq(("2024-01", "b", 1.75)).toDF("mon", "k", "amount")
    Incremental.refreshState(spark, path,
      Incremental.partials(late, group, col("amount")), group, "mon")
    val served = Incremental.finalize(spark.read.parquet(path))
      .select("mon", "k", "n", "sum_c", "min_c", "max_c", "avg_amt", "var_amt")
    val expected = batch(facts.unionByName(late))
      .select("mon", "k", "n", "sum_c", "min_c", "max_c", "avg_amt", "var_amt")
    assert(sortedRows(served) == sortedRows(expected))
  }

  test("refreshState surfaces schema drift instead of treating state as absent") {
    val path = java.nio.file.Files.createTempDirectory("inc_drift").toString
    Incremental.refreshState(spark, path,
      Incremental.partials(facts, group, col("amount")), group, "mon")
    // second slice arrives keyed on a column the stored state lacks: the
    // merge must FAIL (an AnalysisException the caller sees), not fall
    // back to first-load and overwrite history with delta-only partials
    val drifted = facts.withColumnRenamed("k", "k2")
    intercept[org.apache.spark.sql.AnalysisException] {
      Incremental.refreshState(spark, path,
        Incremental.partials(drifted, Seq("k2"), col("amount")), Seq("k2"), "mon")
    }
    // the stored state is untouched by the failed refresh
    val served = Incremental.finalize(spark.read.parquet(path))
      .select("mon", "k", "n", "sum_c", "min_c", "max_c", "avg_amt", "var_amt")
    val expected = batch(facts)
      .select("mon", "k", "n", "sum_c", "min_c", "max_c", "avg_amt", "var_amt")
    assert(sortedRows(served) == sortedRows(expected))
  }
}
