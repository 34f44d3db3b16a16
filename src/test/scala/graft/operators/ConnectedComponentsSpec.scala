package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class ConnectedComponentsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def cc(pairs: Seq[(Long, Long)]): Set[(Long, Long)] =
    ConnectedComponents.run(pairs.toDF("a", "b"), "a", "b")
      .as[(Long, Long)].collect().toSet

  test("two components, chain + triangle, arbitrary edge orientation") {
    // chain 1-2-3-4 (diameter 3) and triangle 10-11-12, mixed order
    val got = cc(Seq((2L, 1L), (2L, 3L), (4L, 3L), (10L, 11L), (12L, 10L), (11L, 12L)))
    assert(got == Set(
      (1L, 1L), (2L, 1L), (3L, 1L), (4L, 1L),
      (10L, 10L), (11L, 10L), (12L, 10L)))
  }

  test("duplicate edges, self-loops and reversed duplicates collapse") {
    val got = cc(Seq((5L, 6L), (6L, 5L), (5L, 6L), (7L, 7L)))
    // self-loop 7 has no real edge: it is isolated and not reported
    assert(got == Set((5L, 5L), (6L, 5L)))
  }

  test("long path converges (stress for round count)") {
    val n = 64L
    val got = cc((1L until n).map(i => (i, i + 1)))
    assert(got == (1L to n).map(i => (i, 1L)).toSet)
  }

  test("deterministic across reruns") {
    val pairs = Seq((3L, 9L), (9L, 4L), (20L, 21L), (1L, 2L), (2L, 3L))
    assert(cc(pairs) == cc(pairs))
  }

  test("random graphs match an independent union-find") {
    val rnd = new scala.util.Random(4242)
    (1 to 8).foreach { _ =>
      val n = 20 + rnd.nextInt(30)
      val edges = Seq.fill(n) {
        (rnd.nextInt(40).toLong, rnd.nextInt(40).toLong)
      }.filter { case (a, b) => a != b }
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      // canonical label = min node id per component, matching run()'s
      // min-id contract
      val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
      val expect = nodes.groupBy(find).flatMap { case (_, ns) =>
        ns.map(v => (v, ns.min))
      }.toSet
      assert(cc(edges) == expect, s"seeded graph with ${edges.size} edges")
    }
  }
}
