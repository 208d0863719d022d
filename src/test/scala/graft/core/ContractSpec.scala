package graft.core

import graft.SparkSpec

/** The data contract must (a) accept the current driver-generated testdata
  * and (b) fail a deliberately mistyped fixture with the table, column,
  * expected, and actual types all named — so the next silent testdata
  * regeneration is a one-line diagnosis, not nine missing gate rows. */
class ContractSpec extends SparkSpec {
  import spark.implicits._

  test("every sfSmoke table conforms to the contract") {
    val bad = Contract.check(spark, sfSmoke)
    assert(bad.isEmpty, s"contract mismatches:\n${bad.mkString("\n")}")
  }

  test("a mistyped events fixture fails with the named mismatch") {
    // events with ts as STRING — none of the accepted encodings
    val dir = java.nio.file.Files.createTempDirectory("contract_bad").toString
    Seq((1L, "2024-01-01T10:00:00", 1L, "click", 0.5, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val bad = Contract.checkTable("events",
      spark.read.parquet(s"$dir/events.parquet").schema)
    assert(bad.size == 1, bad.mkString("\n"))
    assert(bad.head.contains("events.ts") && bad.head.contains("string")
      && bad.head.contains("timestamp"), bad.head)
  }

  test("a missing column is reported as missing, not as a type error") {
    val bad = Contract.checkTable("documents",
      Seq((1L, "hi")).toDF("doc_id", "text").schema)
    assert(bad.exists(m => m.contains("documents.lang") && m.contains("MISSING")))
    assert(bad.exists(m => m.contains("documents.n_chars")))
  }

  test("accepted multi-encoding columns pass under every known encoding") {
    // ts as TIMESTAMP (normalized), as raw Long nanos (legacy), and the
    // on-disk NTZ are all within contract — the dispatch handles each
    val base = Seq((1L, 1L, 1L, "click", 0.5, "{}"))
    val asLong = base.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    assert(Contract.checkTable("events", asLong.schema).isEmpty)
    val asTs = asLong.withColumn("ts",
      org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.col("ts")))
    assert(Contract.checkTable("events", asTs.schema).isEmpty)
  }
}
