package graft.graph

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Property check: the distributed min-label propagation must agree
  * with a driver-side union-find on random graphs (seeded, so failures
  * reproduce).
  */
class ConnectedComponentsPropSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    // min-relabel: component id = min member id (find with path to min root)
    parent.keys.toSeq.map(v => v -> find(v)).toMap
  }

  test("agrees with union-find on 20 random seeded graphs") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    (1 to 20).foreach { trial =>
      val n = 2 + rnd.nextInt(28)
      val m = 1 + rnd.nextInt(40)
      val edges = (1 to m).map { _ =>
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong)
      }.filter { case (a, b) => a != b } // self-loops carry no information
      if (edges.nonEmpty) {
        val want = unionFind(edges)
        val got = ConnectedComponents.components(edges.toDF("src", "dst"))
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(got === want, s"trial $trial: n=$n edges=$edges")
      }
    }
  }
}
