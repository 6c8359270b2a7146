package graft

import org.scalacheck.Gen

/** Spark-free graph ground truth shared by the connected-components and
  * dup-cluster properties (InvariantProps / LlmInvariantProps) — one
  * copy, so a fix to the reference algorithm can never silently diverge
  * between the two suites. */
object GraphTruth {

  /** Random undirected edge lists, self-loops and duplicates included. */
  val edgesGen: Gen[List[(Long, Long)]] = for {
    nNodes <- Gen.choose(2, 24)
    nEdges <- Gen.choose(1, 40)
    edges <- Gen.listOfN(nEdges,
      Gen.zip(Gen.choose(0L, nNodes - 1L), Gen.choose(0L, nNodes - 1L)))
  } yield edges

  /** Plain-Scala union-find: node → min reachable node, for every node
    * appearing in an edge. Unions always point max → min, so the root
    * IS the component minimum. */
  def minLabels(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(n => n -> find(n)).toMap
  }
}
