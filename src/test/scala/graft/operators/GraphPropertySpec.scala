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
}
