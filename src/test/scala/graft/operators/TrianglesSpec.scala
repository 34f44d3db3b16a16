package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Degree-ordered triangle counting vs a brute-force combination scan
  * on seeded random graphs plus the canonical shapes (star: wedges but
  * zero triangles; clique: C(n,3); disjoint edges: zero wedges). */
class TrianglesSpec extends AnyFunSuite {

  private def stats(edges: Seq[(Long, Long)]): (Long, Long, Long) = {
    val spark = SparkTestSession.spark
    import spark.implicits._
    val Array(r) = Triangles.stats(edges.toDF("x", "y")).collect()
    (r.getLong(0), r.getLong(1), r.getLong(2))
  }

  private def brute(edges: Seq[(Long, Long)]): (Long, Long, Long) = {
    val es = edges.toSet
    val vs = edges.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    val deg = vs.map(v => v -> edges.count(e => e._1 == v || e._2 == v)).toMap
    val wedges = vs.map(v => deg(v).toLong * (deg(v) - 1) / 2).sum
    val tris = (for {
      i <- vs.indices; j <- (i + 1) until vs.size; k <- (j + 1) until vs.size
      a = vs(i); b = vs(j); c = vs(k)
      if es((a, b)) && es((b, c)) && es((a, c))
    } yield 1).size.toLong
    (edges.size.toLong, wedges, tris)
  }

  test("random graphs match brute force") {
    val rnd = new scala.util.Random(42)
    for (n <- Seq(6, 12, 25); p <- Seq(0.2, 0.5)) {
      val edges = for {
        a <- 0L until n; b <- (a + 1) until n if rnd.nextDouble() < p
      } yield (a, b)
      assert(stats(edges) == brute(edges), s"n=$n p=$p")
    }
  }

  test("star has wedges but no triangles; clique has C(n,3)") {
    val star = (1L to 8L).map(i => (0L, i))
    assert(stats(star) == (8L, 28L, 0L))
    val k5 = for (a <- 0L until 5L; b <- (a + 1) until 5L) yield (a, b)
    assert(stats(k5) == (10L, 30L, 10L))
    val disjoint = Seq((0L, 1L), (2L, 3L), (4L, 5L))
    assert(stats(disjoint) == (3L, 0L, 0L))
  }
}
