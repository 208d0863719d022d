package graft.operators

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.Prop.propBoolean
import graft.SparkSpec

/** ScalaCheck property: on arbitrary random graphs, both
  * connectedComponents strategies (driver union-find and distributed BSP)
  * must label every node with the minimum id reachable, per a plain BFS
  * reference. Randomized edge lists exercise shapes the fixture spec
  * (GraphSpec) does not: self-loops, duplicate edges, stars, and
  * disconnected singleton-free node sets. */
class GraphPropertySpec extends SparkSpec {

  /** BFS reference over an adjacency map */
  private def bfsComponents(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val adj = scala.collection.mutable.Map.empty[Long, List[Long]]
    edges.foreach { case (a, b) =>
      adj(a) = b :: adj.getOrElse(a, Nil)
      adj(b) = a :: adj.getOrElse(b, Nil)
    }
    val out = scala.collection.mutable.Map.empty[Long, Long]
    adj.keys.toSeq.sorted.foreach { start =>
      if (!out.contains(start)) {
        var frontier = List(start)
        var seen = Set(start)
        while (frontier.nonEmpty) {
          frontier = frontier.flatMap(adj(_)).filterNot(seen)
          seen ++= frontier
        }
        val root = seen.min
        seen.foreach(n => out(n) = root)
      }
    }
    out.toMap
  }

  private val edgeListGen: Gen[List[(Long, Long)]] =
    Gen.listOfN(25, for {
      a <- Gen.choose(0L, 14L)
      b <- Gen.choose(0L, 14L)
    } yield (a, b))

  test("union-find path equals BFS reference on random graphs (ScalaCheck)") {
    import spark.implicits._
    val prop = Prop.forAll(edgeListGen) { edges =>
      edges.nonEmpty ==> {
        val got = Graph.connectedComponents(edges.toDF("a", "b"))
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        got == bfsComponents(edges)
      }
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(12), prop)
    assert(res.passed, res.status.toString)
  }

  test("BSP path equals BFS reference on random graphs (ScalaCheck)") {
    import spark.implicits._
    val prop = Prop.forAll(edgeListGen) { edges =>
      edges.nonEmpty ==> {
        val got = Graph.connectedComponents(edges.toDF("a", "b"),
            localEdgeThreshold = 0L)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        got == bfsComponents(edges)
      }
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(4), prop)
    assert(res.passed, res.status.toString)
  }

  /** exact integer pagerank reference: same recurrence as the operator */
  private def prReference(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val es = edges.distinct
    val nodes = es.flatMap(e => Seq(e._1, e._2)).distinct
    val outdeg = es.groupBy(_._1).map { case (s, g) => s -> g.size.toLong }
    var pr = nodes.map(_ -> 1000000L).toMap
    for (_ <- 1 to iters) {
      val in = nodes.map { n =>
        n -> es.filter(_._2 == n).map(e => pr(e._1) / outdeg(e._1)).sum
      }.toMap
      pr = nodes.map(n => n -> (150000L + (85L * in(n)) / 100L)).toMap
    }
    pr
  }

  test("pageRankQ local path matches the exact recurrence on random graphs (ScalaCheck)") {
    import spark.implicits._
    val prop = Prop.forAll(edgeListGen) { edges =>
      edges.nonEmpty ==> {
        val got = Graph.pageRankQ(edges.toDF("a", "b"), 3)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        got == prReference(edges, 3)
      }
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(12), prop)
    assert(res.passed, res.status.toString)
  }

  test("pageRankQ BSP path matches the exact recurrence on random graphs (ScalaCheck)") {
    import spark.implicits._
    val prop = Prop.forAll(edgeListGen) { edges =>
      edges.nonEmpty ==> {
        val got = Graph.pageRankQ(edges.toDF("a", "b"), 3,
            localEdgeThreshold = 0L)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        got == prReference(edges, 3)
      }
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(3), prop)
    assert(res.passed, res.status.toString)
  }
}
