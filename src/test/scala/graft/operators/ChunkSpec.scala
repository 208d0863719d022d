package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ChunkSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "a b c d e f g h i j"), // 10 tokens
    (2L, "x"),                   // single token
    (3L, "p q r s t")            // 5 tokens
  ).toDF("doc_id", "text")

  test("overlapping windows carry provenance and true tail lengths") {
    val got = Chunk.sliding(docs, window = 4, stride = 2)
      .as[(Long, Long, Long, Long, String)].collect()
      .groupBy(_._1).map { case (k, v) => k -> v.sortBy(_._2).toList }
    // doc 1: starts 0,2,4,6,8 — the last windows shrink to the tail
    assert(got(1L) == List(
      (1L, 0L, 0L, 4L, "a b c d"), (1L, 1L, 2L, 4L, "c d e f"),
      (1L, 2L, 4L, 4L, "e f g h"), (1L, 3L, 6L, 4L, "g h i j"),
      (1L, 4L, 8L, 2L, "i j")))
    assert(got(2L) == List((2L, 0L, 0L, 1L, "x")))
    assert(got(3L).map(_._5) == List("p q r s", "r s t", "t"))
  }

  test("stride == window partitions the doc: concatenation reconstructs it") {
    val rebuilt = Chunk.sliding(docs, window = 3, stride = 3)
      .groupBy(col("doc_id"))
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("chunk_id"), col("chunk_text")))),
        x => x("chunk_text")), " ").as("text"))
      .as[(Long, String)].collect().toMap
    val want = docs.as[(Long, String)].collect().toMap
    assert(rebuilt == want)
  }

  test("every consecutive chunk pair overlaps by window - stride tokens") {
    val rows = Chunk.sliding(docs, window = 4, stride = 2)
      .as[(Long, Long, Long, Long, String)].collect()
      .groupBy(_._1)
    rows.values.foreach { cs =>
      cs.sortBy(_._2).sliding(2).foreach {
        case Array(a, b) =>
          val aToks = a._5.split(" ").toSeq
          val bToks = b._5.split(" ").toSeq
          assert(aToks.drop(2) == bToks.take(aToks.length - 2),
            s"overlap broken between ${a._5} and ${b._5}")
        case _ => ()
      }
    }
  }
}
