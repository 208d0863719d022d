package graft.operators

import org.apache.spark.sql.{AnalysisException, Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance — the "don't rescan history" primitive.
  *
  * The reference recomputes every staging rollup from the full raw table on
  * each cron run (e.g. the YTM rebuild in jobs/raw_to_staging.py:165-205
  * re-reads the whole year). At 10³ rows that is free; at 100 TB a refresh
  * that rescans history is the difference between a minutes-long delta job
  * and a full-warehouse pass. This operator keeps a small MERGEABLE STATE
  * table per group — (n, sum, min, max, sum-of-squares) in exact integer
  * cents — so a new slice of facts folds in with one partial aggregation
  * over the delta plus one overwrite of only the touched partitions:
  *
  *   state(t+1) = merge(state(t), partials(delta))
  *
  * All components are distributive (count/sum/min/max) or algebraic
  * (avg/variance derive from them at read time), so `merge` is associative
  * and commutative: slices can arrive in any order and at any parallelism
  * and the state is bit-identical to a from-scratch build — asserted in
  * IncrementalSpec, and cross-engine on the oracle gate (q43, whose DuckDB
  * side recomputes the same answers directly over all facts).
  *
  * Quantization headroom: values are exact cents (Money.cents), so `sumsq_c`
  * holds Σ(cents²). With ~1e7-cent line items that is ~1e14 per row — a
  * group needs ~10⁴ rows before sumsq reaches 1e18, within long range; for
  * wider groups promote sumsq_c to DECIMAL(38,0) at the partials stage.
  *
  * Deltas are additive, not idempotent: replay protection is the ingest
  * layer's job (the batch-id high-water mark pattern in
  * streaming/CorpusStream), not this operator's.
  */
object Incremental {

  /** The mergeable components appended to the group columns. */
  val stateCols: Seq[String] = Seq("n", "sum_c", "min_c", "max_c", "sumsq_c")

  /** Partial state for one slice of the fact stream: one map-side-combinable
    * aggregation, values quantized to exact cents first. */
  def partials(df: DataFrame, groupCols: Seq[String], valueCol: Column): DataFrame = {
    val c = graft.functions.Money.cents(valueCol)
    df.groupBy(groupCols.map(col): _*).agg(
      count(lit(1)).as("n"),
      sum(c).as("sum_c"),
      min(c).as("min_c"),
      max(c).as("max_c"),
      sum(c * c).as("sumsq_c"))
  }

  /** Merge any number of states. Each component re-aggregates with its own
    * combiner, so this is associative + commutative — slice arrival order
    * and partitioning never change the result. */
  def merge(groupCols: Seq[String], states: DataFrame*): DataFrame =
    states.reduce(_ unionByName _)
      .groupBy(groupCols.map(col): _*).agg(
        sum(col("n")).as("n"),
        sum(col("sum_c")).as("sum_c"),
        min(col("min_c")).as("min_c"),
        max(col("max_c")).as("max_c"),
        sum(col("sumsq_c")).as("sumsq_c"))

  /** Serving-time view: the algebraic aggregates (mean, population variance)
    * derived from the exact integer state. Both are quantized to 1e-4 with
    * the same floor(x*scale + 0.5) convention as Money.cents — `round(x, 4)`
    * is NOT cross-engine-safe when the rational sum/n lands exactly on a
    * half-decimal (observed at sf0.001), the floor form is the one the
    * whole suite already hash-matches on. */
  def finalize(state: DataFrame): DataFrame = {
    val keep = state.columns.filterNot(stateCols.contains).map(col).toSeq
    val nD = col("n").cast("double")
    val sumD = col("sum_c").cast("double")
    // cents/100 → dollars; ×1e4 quantization = sum_c*100/n in integer units
    val avg = (floor(sumD * 100.0 / nD + 0.5).cast("long") / 10000.0)
      .as("avg_amt")
    // population variance in cents² is already the 1e-4-dollar² unit
    val varp = (floor((col("sumsq_c").cast("double") - sumD * sumD / nD) / nD
      + 0.5).cast("long") / 10000.0).as("var_amt")
    state.select(keep ++ Seq(col("n"), col("sum_c"), col("min_c"),
      col("max_c"), avg, varp): _*)
  }

  // ---- mergeable histogram state: incremental quantiles ----
  // q35's fixed-width bucket sketch, kept as (group, bucket, n) state rows:
  // merging slices is a plain re-sum per bucket (distributive), so the
  // quantile sketch gains the same delta-refresh property as the
  // count/sum/min/max state above. q47 proves the merged state finalizes
  // identically to the sketch computed directly over all facts.

  /** Histogram partial state for one slice: bucket = value in cents div
    * `bucketCents`, one map-side-combinable aggregation. */
  def histPartials(df: DataFrame, groupCols: Seq[String], valueCol: Column,
                   bucketCents: Long = 10000L): DataFrame =
    df.withColumn("__pc", graft.functions.Money.cents(valueCol))
      .groupBy(groupCols.map(col) :+
        expr(s"__pc div $bucketCents").as("bucket"): _*) // q35's exact bucket
      .agg(count(lit(1)).as("n"))

  /** Merge histogram states: re-sum per (group, bucket). */
  def histMerge(groupCols: Seq[String], states: DataFrame*): DataFrame =
    states.reduce(_ unionByName _)
      .groupBy((groupCols :+ "bucket").map(col): _*)
      .agg(sum(col("n")).as("n"))

  /** Quantile read over the state: each requested p gets the inclusive
    * upper bound (in cents) of the bucket where the cumulative count
    * crosses ceil(p·total) — deterministic, exact-integer, within one
    * bucket width of the true quantile (q35's formulation). The windows
    * run over the tiny bucket table, never the facts. */
  def finalizeQuantiles(state: DataFrame, groupCols: Seq[String],
                        ps: Seq[Double],
                        bucketCents: Long = 10000L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wCum = Window.partitionBy(groupCols.map(col): _*).orderBy(col("bucket"))
    val wAll = Window.partitionBy(groupCols.map(col): _*)
    def pick(p: Double): Column =
      ((min(when(col("cum") >= ceil(lit(p) * col("total")), col("bucket")))
        + 1) * bucketCents).as(s"p${(p * 100).round}_upper_cents")
    state
      .withColumn("cum", sum(col("n")).over(wCum))
      .withColumn("total", sum(col("n")).over(wAll))
      .groupBy(groupCols.map(col): _*)
      .agg(max(col("total")).as("n_rows"), ps.map(pick): _*)
  }

  /** Fold a delta into a parquet state table, rewriting ONLY the partitions
    * the delta touches: existing state rows for touched partitions are
    * semi-joined out, merged with the delta's partials, and dynamically
    * overwritten in place. Untouched history is never read or written. */
  def refreshState(spark: SparkSession, statePath: String, deltaPartials: DataFrame,
                   groupCols: Seq[String], partitionCol: String): Unit = {
    val merged =
      try {
        val touched = deltaPartials.select(col(partitionCol)).distinct()
        val existing = spark.read.parquet(statePath)
          .join(touched, Seq(partitionCol), "left_semi")
        merge(groupCols, existing, deltaPartials)
      } catch {
        // ONLY path-not-found means "first slice, no state yet"; any other
        // analysis failure (schema drift, missing groupCol in old state)
        // must surface, or touched partitions get overwritten with
        // delta-only partials and history counts are silently lost
        case e: AnalysisException if graft.core.Sink.pathMissing(e) =>
          merge(groupCols, deltaPartials)
      }
    graft.core.Sink.overwritePartitions(merged, statePath, Seq(partitionCol))
  }
}
