package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Redaction must replace every planted literal with its typed token,
  * leave clean text untouched, be idempotent, and drive the residual-PII
  * gate to zero. */
class PiiSpec extends SparkSpec {
  import spark.implicits._

  private val planted = Seq(
    (1L, "contact alice.smith+news@example.co.uk for details"),
    (2L, "server at 192.168.001.1 responded"),
    (3L, "call +1 (415) 555-0173 or (212) 555-0199 now"),
    (4L, "perfectly clean sentence with numbers 42 and 7"),
    (5L, "mixed: bob@x.io from 10.0.0.2 dialed +44 20 7946 0958"),
    (6L, "released 2024-01-01 12:30:45 build 12345678 v2.11.3"))

  test("planted PII is replaced by typed tokens; clean text untouched") {
    val got = planted.toDF("id", "text")
      .select($"id", Pii.redact($"text").as("r"))
      .as[(Long, String)].collect().toMap
    assert(got(1L) == "contact <EMAIL> for details")
    assert(got(2L) == "server at <IP> responded")
    assert(got(3L) == "call <PHONE> or <PHONE> now")
    assert(got(4L) == "perfectly clean sentence with numbers 42 and 7")
    assert(got(5L) == "mixed: <EMAIL> from <IP> dialed <PHONE>")
    // dates, timestamps, build ids, versions are NOT phone numbers —
    // the marker-required patterns must leave them intact
    assert(got(6L) == "released 2024-01-01 12:30:45 build 12345678 v2.11.3")
  }

  test("redaction is idempotent and zeroes the residual-PII gate") {
    val df = planted.toDF("id", "text")
      .withColumn("r1", Pii.redact($"text"))
      .withColumn("r2", Pii.redact($"r1"))
    assert(df.filter($"r1" =!= $"r2").count() == 0)
    assert(df.agg(sum(Pii.piiCount($"r1"))).head().getLong(0) == 0L)
    // and the gate sees the planted literals before redaction
    assert(df.agg(sum(Pii.piiCount($"text"))).head().getLong(0) >= 6L)
  }
}
