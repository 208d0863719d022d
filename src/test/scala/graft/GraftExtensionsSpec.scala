package graft

/** The extension class must make every native expression callable from SQL
  * with no imperative register() call anywhere. spark.sql.extensions is a
  * STATIC conf — it only applies when the JVM's first session is built —
  * so the shared SparkSpec session carries it (as do the Verify/Bench
  * mains), and this spec asserts the functions resolve there. */
class GraftExtensionsSpec extends SparkSpec {

  test("native expressions resolve via spark.sql.extensions") {
    val row = spark.sql(
      """SELECT
           graft_quantized_dot(array(CAST(1.5 AS FLOAT)), array(CAST(2.0 AS FLOAT))) AS d,
           graft_quantized_norm2(array(CAST(1.5 AS FLOAT))) AS n2,
           graft_char_grams('abab', 2) AS g,
           graft_rolling_min_hash('abcdefgh', 8, 257L, 1000000007L) AS rh
      """).collect().head
    assert(row.getLong(0) == 1500L * 2000L)
    assert(row.getLong(1) == 1500L * 1500L)
    assert(row.getSeq[String](2) == Seq("ab", "ba"))
    // reference rolling hash of the single 8-char window
    val ref = "abcdefgh".foldLeft(0L)((h, c) => (h * 257 + c.toLong) % 1000000007L)
    assert(row.getLong(3) == ref)
  }
}
