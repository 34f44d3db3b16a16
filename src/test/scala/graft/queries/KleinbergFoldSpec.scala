package graft.queries

import scala.util.Random

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** q280's determinism contract: once the rate/transition constants are
  * quantized to integer micros, the two-state Viterbi fold is pure
  * integer min/plus with fixed tie-breaks — so Spark's aggregate()
  * expression must match a plain Scala Long fold EXACTLY (costs and
  * path strings) on randomized series, including bursty ones that
  * actually exercise the state-1 branches. Also pins no-overflow: the
  * 1e15 INF plus a year of hourly costs stays far from Long range. */
class KleinbergFoldSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("viterbi fold matches the Scala integer reference bit-for-bit") {
    val rng = new Random(7)
    // 40 series: Poisson-ish base with injected bursts so both states
    // and both tie-break branches are exercised
    val cases = (0 until 40).map { c =>
      val t = 5 + rng.nextInt(200)
      val base = 1 + rng.nextInt(5)
      val arr = (0 until t).map { i =>
        val burst = (i / 10) % 3 == 1 && rng.nextBoolean()
        (if (burst) base * (2 + rng.nextInt(4)) else rng.nextInt(2 * base)).toLong
      }
      c -> arr
    }.toMap

    val df = cases.toSeq.map { case (c, arr) => (c, arr) }
      .toDF("c", "arr")
      .withColumn("n", expr("aggregate(arr, CAST(0 AS BIGINT), (a, v) -> a + v)"))
      .withColumn("t", size(col("arr")).cast("long"))
      .filter(col("n") > 0)
      .withColumn("lm0", round(col("n").cast("double") / col("t") * 1000000).cast("long"))
      .withColumn("lm1", round(col("n").cast("double") / col("t") * 2000000).cast("long"))
      .withColumn("l0", round(log(col("n").cast("double") / col("t")) * 1000000).cast("long"))
      .withColumn("l1", round(log(col("n").cast("double") / col("t") * 2) * 1000000).cast("long"))
      .withColumn("g", round(log(col("t").cast("double")) * 250000).cast("long"))
      .withColumn("f", expr(
        """aggregate(arr,
          |  named_struct('c0', CAST(0 AS BIGINT),
          |    'c1', CAST(1000000000000000 AS BIGINT), 'p0', '', 'p1', ''),
          |  (a, v) -> named_struct(
          |    'c0', least(a.c0, a.c1) + lm0 - v * l0,
          |    'c1', least(a.c0 + g, a.c1) + lm1 - v * l1,
          |    'p0', concat(CASE WHEN a.c1 < a.c0 THEN a.p1 ELSE a.p0 END,
          |      '0'),
          |    'p1', concat(CASE WHEN a.c0 + g < a.c1 THEN a.p0 ELSE a.p1
          |      END, '1')))""".stripMargin))
      .select(col("c"), col("lm0"), col("lm1"), col("l0"), col("l1"),
        col("g"), col("f.c0"), col("f.c1"), col("f.p0"), col("f.p1"))
      .as[(Int, Long, Long, Long, Long, Long, Long, Long, String, String)]
      .collect()

    assert(df.length == cases.size)
    var state1Seen = false
    df.foreach { case (c, lm0, lm1, l0, l1, g, gc0, gc1, gp0, gp1) =>
      val arr = cases(c)
      var c0 = 0L; var c1 = 1000000000000000L; var p0 = ""; var p1 = ""
      arr.foreach { v =>
        val nc0 = math.min(c0, c1) + lm0 - v * l0
        val nc1 = math.min(c0 + g, c1) + lm1 - v * l1
        val np0 = (if (c1 < c0) p1 else p0) + "0"
        val np1 = (if (c0 + g < c1) p0 else p1) + "1"
        c0 = nc0; c1 = nc1; p0 = np0; p1 = np1
      }
      assert(gc0 == c0 && gc1 == c1, s"case $c costs: ($gc0,$gc1) vs ($c0,$c1)")
      assert(gp0 == p0 && gp1 == p1, s"case $c paths differ")
      val best = if (c0 <= c1) p0 else p1
      if (best.contains('1')) state1Seen = true
      // overflow headroom: every intermediate stays far inside Long
      assert(math.abs(c0) < Long.MaxValue / 4 && c1 < Long.MaxValue / 4)
    }
    assert(state1Seen, "fixture too tame: no case ever entered the burst state")
  }
}
