package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Adversarial coverage of [[FairShare.allocate]] against an
  * INDEPENDENT reference: a driver-side greedy waterfill that raises
  * the waterline demand by demand (sorted ascending) — a different
  * algorithm from the closed-form prefix-sum the operator runs, so
  * agreement pins the math, not the implementation. Cases include the
  * shapes the q169 fixture can't produce: all-equal demands, one
  * giant + dust, zero demands, a budget larger than total demand,
  * budget 0, and 60 seeded random demand sets.
  */
class FairSharePropertySpec extends AnyFunSuite {

  /** Reference: raise the waterline rank by rank. Returns key→alloc. */
  private def reference(demands: Seq[(String, Long)], num: Long,
      den: Long): Map[String, Long] = {
    val total = demands.map(_._2).sum
    val budget = num * total / den
    val sorted = demands.sortBy { case (k, d) => (d, k) }
    var remaining = budget
    var left = sorted.length
    val out = scala.collection.mutable.Map[String, Long]()
    var i = 0
    var lam = -1L; var rem = 0L; var capIdx = -1
    while (i < sorted.length && capIdx < 0) {
      val (_, d) = sorted(i)
      val share = remaining / left
      if (share < d) { lam = share; rem = remaining - share * left; capIdx = i }
      else { out(sorted(i)._1) = d; remaining -= d; left -= 1; i += 1 }
    }
    if (capIdx >= 0) {
      var j = capIdx
      while (j < sorted.length) {
        out(sorted(j)._1) = lam + (if (j - capIdx < rem) 1L else 0L)
        j += 1
      }
    }
    out.toMap
  }

  private def run(demands: Seq[(String, Long)], num: Long = 8,
      den: Long = 10): Unit = {
    val spark = SparkTestSession.spark
    import spark.implicits._
    val df = demands.toDF("key", "d")
    val got = FairShare.allocate(df, num, den).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    val ref = reference(demands, num, den)
    val total = demands.map(_._2).sum
    val budget = num * total / den
    assert(got.keySet == demands.map(_._1).toSet)
    got.foreach { case (k, (d, a, capped)) =>
      assert(a == ref(k), s"$k: operator=$a reference=${ref(k)} in $demands")
      assert(a <= d, s"$k allocated over demand")
      assert((capped == 1L) == (a < d),
        s"$k: capped must mean alloc < demand (d=$d a=$a capped=$capped)")
    }
    val sumA = got.values.map(_._2).sum
    if (budget <= total) assert(sumA == budget,
      s"sum ${sumA} != budget $budget for $demands")
    else assert(sumA == total, s"over-budget case must allocate all demand")
  }

  test("edge shapes: equal, giant+dust, zeros, over-budget, zero budget") {
    run(Seq("a" -> 10L, "b" -> 10L, "c" -> 10L, "d" -> 10L))
    run(Seq("whale" -> 1000000L, "d1" -> 3L, "d2" -> 1L, "d3" -> 2L))
    run(Seq("z1" -> 0L, "z2" -> 0L, "big" -> 100L, "mid" -> 50L))
    run(Seq("a" -> 5L, "b" -> 7L), num = 20, den = 10) // budget > demand
    run(Seq("a" -> 5L, "b" -> 7L), num = 0, den = 10) // zero budget
    run(Seq("only" -> 42L))
  }

  test("60 seeded random demand sets agree with the independent fold") {
    val rnd = new scala.util.Random(0xfa125eed)
    for (_ <- 1 to 60) {
      val n = 1 + rnd.nextInt(12)
      val demands = (0 until n).map { i =>
        val d = rnd.nextInt(4) match {
          case 0 => rnd.nextInt(10).toLong // dust
          case 1 => rnd.nextInt(1000).toLong
          case 2 => 100L // forced ties
          case _ => rnd.nextInt(1000000).toLong // whale range
        }
        (s"k$i", d)
      }
      val num = 1 + rnd.nextInt(12)
      run(demands, num = num, den = 10)
    }
  }
}
