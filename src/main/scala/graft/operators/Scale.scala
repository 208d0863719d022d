package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale patterns for the shapes that break first at 100 TB: skewed join
  * keys and repeated co-located joins.
  *
  * These are the knobs SURVEY.md §4.3 / the build rules call out (salting for
  * skew, bucketing for shuffle-free joins); AQE's skew-join handles moderate
  * skew automatically, salting is the explicit fallback for pathological keys
  * (one key = 30% of a 100 TB fact table), bucketing is the amortization when
  * the same join key is reused across many queries of a pipeline run.
  */
object Scale {

  /** Salted equi-join for skewed left (fact) keys: the fact side gets a
    * deterministic salt in [0, saltFactor), the dimension side is replicated
    * once per salt value, and the join runs on (key, salt) — a hot key's rows
    * spread over `saltFactor` reducers instead of one. Semantics are exactly
    * the plain inner equi-join. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
                 saltFactor: Int): DataFrame = {
    val salts = dim.sparkSession.range(saltFactor.toLong)
      .select(col("id").cast("int").as("__salt"))
    val saltedFact = fact.withColumn("__salt",
      pmod(hash(col(key), monotonically_increasing_id()), lit(saltFactor)).cast("int"))
    val saltedDim = dim.crossJoin(broadcast(salts))
    saltedFact.join(saltedDim, Seq(key, "__salt")).drop("__salt")
  }

  /** Write both sides bucketed by the join key so subsequent joins are
    * exchange-free: each bucket pair joins locally. Requires a table catalog
    * (saveAsTable); `numBuckets` should match the pipeline's reducer budget. */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    numBuckets: Int): Unit =
    df.write
      .bucketBy(numBuckets, key)
      .sortBy(key)
      .mode("overwrite")
      .format("parquet")
      .saveAsTable(table)

  /** True when the executed plan of `df` contains no shuffle exchange —
    * the assertion that bucketed co-location actually engaged. */
  def isExchangeFree(df: DataFrame): Boolean = {
    val plan = df.queryExecution.executedPlan.toString()
    !plan.contains("Exchange hashpartitioning")
  }
}
