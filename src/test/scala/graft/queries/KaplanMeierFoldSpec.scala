package graft.queries

import scala.util.Random

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** q198's bit-stability contract: the survival column is an
  * order-pinned left fold of IEEE-exact factors, so Spark's
  * `aggregate(slice(a, 1, i+1), 1.0, (acc,y) -> acc*y.f)` must equal
  * a plain Scala Double left fold BIT FOR BIT on randomized
  * (n_risk, d) curves — no libm call anywhere means no 1-ulp JIT
  * license to flake on (the r10 q198 hash failure). Also pins the
  * fold against an exact BigDecimal product: each multiply is
  * correctly rounded, so n multiplies accumulate at most ~n ulps. */
class KaplanMeierFoldSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("survival fold is bit-identical to a Scala Double left fold " +
    "and within n ulps of the BigDecimal product") {
    val rng = new Random(42)
    // 50 curves, lengths 1..40, n_risk strictly decreasing, 1 <= d <=
    // n_risk (d == n_risk exercises the exact-zero step)
    val curves = (0 until 50).map { c =>
      val len = 1 + rng.nextInt(40)
      var nRisk = 50L + rng.nextInt(100000)
      val steps = (0 until len).flatMap { i =>
        if (nRisk <= 0) None
        else {
          val d =
            if (i == len - 1 && rng.nextInt(5) == 0) nRisk // kill-all step
            else 1L + rng.nextInt(math.min(nRisk, 7L).toInt)
          val row = (c, i.toLong, nRisk, d)
          nRisk -= d + rng.nextInt(50)
          Some(row)
        }
      }
      c -> steps
    }.toMap

    val df = curves.values.flatten.toSeq
      .toDF("curve", "dur", "n_risk", "d")
      .withColumn("f",
        (col("n_risk") - col("d")).cast("double") / col("n_risk"))
    // the exact expression shape q198 uses (sorted struct array, fold
    // over the slice prefix), grouped per curve
    val got = df.groupBy(col("curve"))
      .agg(sort_array(collect_list(struct(col("dur"), col("n_risk"),
        col("d"), col("f")))).as("a"))
      .select(col("curve"), expr(
        """transform(a, (x, i) -> struct(
          |  x.dur AS dur,
          |  aggregate(slice(a, 1, i + 1), CAST(1.0 AS DOUBLE),
          |    (acc, y) -> acc * y.f) AS s,
          |  round(aggregate(slice(a, 1, i + 1), CAST(1.0 AS DOUBLE),
          |    (acc, y) -> acc * y.f), 4) AS s4))""".stripMargin).as("r"))
      .as[(Int, Seq[(Long, Double, Double)])]
      .collect().toMap

    assert(got.keySet == curves.keySet)
    curves.foreach { case (c, steps) =>
      val factors = steps.sortBy(_._2).map { case (_, _, n, d) =>
        (n - d).toDouble / n.toDouble
      }
      // Scala reference: same left-multiplication chain
      var acc = 1.0
      val ref = factors.map { f => acc *= f; acc }
      val refBig = factors.scanLeft(BigDecimal(1)) { (a, f) =>
        a * BigDecimal(f)
      }.tail
      val rows = got(c).sortBy(_._1)
      assert(rows.length == ref.length, s"curve $c length")
      rows.zip(ref).zip(refBig).zipWithIndex.foreach {
        case (((row, want), wantBig), i) =>
          // bit-identical fold (the cross-engine stability claim)
          assert(java.lang.Double.doubleToLongBits(row._2) ==
            java.lang.Double.doubleToLongBits(want),
            s"curve $c step $i: got ${row._2}, fold says $want")
          // rounded output matches HALF_UP on the same double
          val want4 = BigDecimal(want)
            .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
          assert(row._3 == want4,
            s"curve $c step $i round: got ${row._3}, want $want4")
          // and the double fold tracks the exact product to ~n ulps
          val exact = wantBig.toDouble
          val tol = math.max(math.ulp(exact) * (i + 2).toDouble, 1e-300)
          assert(math.abs(row._2 - exact) <= tol,
            s"curve $c step $i vs BigDecimal: ${row._2} vs $exact")
      }
      // a kill-all step (d == n_risk) zeroes survival exactly, forever
      val killIdx = factors.indexWhere(_ == 0.0)
      if (killIdx >= 0)
        rows.drop(killIdx).foreach(r => assert(r._2 == 0.0))
    }
  }
}
