package graft.operators

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.Prop.propBoolean
import graft.SparkSpec

/** ScalaCheck properties for NearDup.chunkDedup against a plain-Scala
  * reference: random corpora over a 4-word vocabulary force heavy chunk
  * collisions, exercising fully-absorbed documents, singleton chunks, and
  * partial final chunks. Also pins idempotence — re-deduping an already
  * deduped corpus must change nothing. */
class ChunkDedupPropertySpec extends SparkSpec {

  private val C = 3 // chunk size in words

  /** scalar reference: global first-occurrence-wins, in-order reassembly */
  private def reference(docs: Seq[(Long, String)]): Map[Long, (Long, String)] = {
    val seen = scala.collection.mutable.Set.empty[String]
    docs.sortBy(_._1).map { case (id, text) =>
      val kept = text.split(" ").grouped(C).map(_.mkString(" "))
        .filter(ch => seen.add(ch)).toSeq
      id -> (kept.size.toLong, kept.mkString(" "))
    }.toMap.filter(_._2._1 > 0)
  }

  private val corpusGen: Gen[List[(Long, String)]] = for {
    n <- Gen.choose(1, 10)
    texts <- Gen.listOfN(n, for {
      w <- Gen.choose(1, 11)
      words <- Gen.listOfN(w, Gen.oneOf("aa", "bb", "cc", "dd"))
    } yield words.mkString(" "))
  } yield texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }

  test("chunkDedup equals the scalar first-occurrence reference (ScalaCheck)") {
    import spark.implicits._
    val prop = Prop.forAll(corpusGen) { docs =>
      docs.nonEmpty ==> {
        val got = NearDup.chunkDedup(docs.toDF("doc_id", "text"), chunkWords = C)
          .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
        got == reference(docs)
      }
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(12), prop)
    assert(res.passed, res.status.toString)
  }

  test("idempotence: deduping a deduped corpus is the identity (ScalaCheck)") {
    import spark.implicits._
    val prop = Prop.forAll(corpusGen) { docs =>
      docs.nonEmpty ==> {
        val once = NearDup.chunkDedup(docs.toDF("doc_id", "text"), chunkWords = C)
          .collect().map(r => (r.getLong(0), r.getString(2))).toSeq
        once.isEmpty || {
          val twice = NearDup.chunkDedup(once.toDF("doc_id", "text"), chunkWords = C)
            .collect().map(r => (r.getLong(0), r.getString(2))).toSeq
          twice.sorted == once.sorted
        }
      }
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(8), prop)
    assert(res.passed, res.status.toString)
  }
}
