package graft.sources

import java.sql.DriverManager
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** JDBC source/sink wrappers (S1/S2/S6/S7/S8): the production bindings for
  * the reference's three database engines (reference: models/engine.py:10-23,
  * models/engine_source.py:27-52) and its write modes.
  *
  * Reads push filters/projections down via Catalyst's JDBC pushdown — the
  * DataFrame-side predicates end up in the generated WHERE clause, replacing
  * the reference's ~80 hand-written SQL strings (SURVEY.md §2.1 S1, §4.1).
  * `partitionColumn` bounds give parallel range-partitioned scans at scale.
  *
  * No database ships in this environment, so these wrappers are exercised
  * for plan construction only; the parquet-backed [[graft.core.Sink]] is the
  * tested sink.
  */
object Jdbc {

  def read(spark: SparkSession, url: String, table: String,
           props: Map[String, String] = Map.empty): DataFrame = {
    val r = spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
    props.foldLeft(r) { case (acc, (k, v)) => acc.option(k, v) }.load()
  }

  /** Range-partitioned parallel scan for big tables. */
  def readPartitioned(spark: SparkSession, url: String, table: String,
                      partitionColumn: String, lower: Long, upper: Long,
                      numPartitions: Int): DataFrame =
    spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .option("partitionColumn", partitionColumn)
      .option("lowerBound", lower)
      .option("upperBound", upper)
      .option("numPartitions", numPartitions)
      .load()

  /** Chunked append — the reference's `to_sql(chunksize=10000)`
    * (reference: jobs/raw_to_staging.py:204-205). */
  def append(df: DataFrame, url: String, table: String,
             batchSize: Int = 10000): Unit =
    df.write.mode(SaveMode.Append)
      .format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .option("batchsize", batchSize)
      .save()

  /** TRUNCATE-preserving overwrite (S8: reference
    * Model/Factory_elect_simulator_update.py:129-142). */
  def replaceAll(df: DataFrame, url: String, table: String): Unit =
    df.write.mode(SaveMode.Overwrite)
      .format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .option("truncate", "true")
      .save()

  /** The S7 delete-then-append refresh. NOT atomic: the DELETE commits
    * before the append starts (executors hold their own connections), so a
    * mid-append failure leaves the window empty and readers can observe the
    * gap — the same visibility contract (and the same flaw) as the
    * reference's `conn.execute(DELETE); to_sql(append)` pair (reference:
    * jobs/raw_to_staging.py:201-205). For an atomic refresh, write to a
    * staging table and swap inside one transaction
    * (append → BEGIN; DELETE window; INSERT..SELECT FROM stage; COMMIT),
    * which keeps the bulk load parallel and the visible switch transactional. */
  def deleteThenAppend(df: DataFrame, url: String, table: String,
                       deleteWhere: String, batchSize: Int = 10000): Unit = {
    val conn = DriverManager.getConnection(url)
    try {
      conn.setAutoCommit(false)
      val st = conn.createStatement()
      st.executeUpdate(s"DELETE FROM $table WHERE $deleteWhere")
      conn.commit()
    } finally conn.close()
    append(df, url, table, batchSize)
  }
}
