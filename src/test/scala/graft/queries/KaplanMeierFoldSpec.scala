package graft.queries

import scala.util.Random

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** q198's bit-stability contract, integer edition: survival_micro is
  * an INTEGER FIXED-POINT LEFT FOLD — acc₀ = 10¹², accᵢ =
  * accᵢ₋₁·(n_riskᵢ−dᵢ) div n_riskᵢ — so Spark's
  * `aggregate(slice(a, 1, i+1), DECIMAL(38,0), ·)` must equal a plain
  * Scala BigInt floor-division fold EXACTLY (not to ulps: there is no
  * float anywhere, hence nothing for an engine version or JIT state
  * to flake on — the lesson of the r10 libm flake and the r11
  * list_reduce cross-version divergence). Also pins the fixed-point
  * error envelope: acc/10¹² tracks the exact rational product within
  * k steps of 10⁻¹² each, so survival_micro = acc div 10⁶ is within
  * 1 micro of the true curve for any k ≤ 10⁶. */
class KaplanMeierFoldSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val Carry = BigInt(1000000000000L) // 10^12

  test("survival_micro fold is exactly the BigInt floor-division fold " +
    "and within 1 micro of the exact rational product") {
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
    // the exact expression shape q198 uses (sorted struct array,
    // integer fold over the slice prefix), grouped per curve
    val got = df.groupBy(col("curve"))
      .agg(sort_array(collect_list(struct(col("dur"), col("n_risk"),
        col("d")))).as("a"))
      .select(col("curve"), expr(
        """transform(a, (x, i) -> struct(
          |  x.dur AS dur,
          |  aggregate(slice(a, 1, i + 1),
          |    CAST(1000000000000 AS DECIMAL(38,0)),
          |    (acc, y) -> CAST((acc * (y.n_risk - y.d)) div y.n_risk
          |      AS DECIMAL(38,0))) AS acc,
          |  CAST(aggregate(slice(a, 1, i + 1),
          |      CAST(1000000000000 AS DECIMAL(38,0)),
          |      (acc, y) -> CAST((acc * (y.n_risk - y.d)) div y.n_risk
          |        AS DECIMAL(38,0)))
          |    div 1000000 AS BIGINT) AS survival_micro))""".stripMargin)
        .as("r"))
      .as[(Int, Seq[(Long, java.math.BigDecimal, Long)])]
      .collect().toMap

    assert(got.keySet == curves.keySet)
    curves.foreach { case (c, steps) =>
      val ordered = steps.sortBy(_._2).map { case (_, _, n, d) => (n, d) }
      // Scala reference: same floor-division chain on BigInt
      var acc = Carry
      val ref = ordered.map { case (n, d) => acc = acc * (n - d) / n; acc }
      // exact rational prefix products (num/den), for the envelope
      var num = BigInt(1); var den = BigInt(1)
      val exact = ordered.map { case (n, d) =>
        num *= (n - d); den *= n; (num, den)
      }
      val rows = got(c).sortBy(_._1)
      assert(rows.length == ref.length, s"curve $c length")
      rows.zip(ref).zip(exact).zipWithIndex.foreach {
        case (((row, want), (nm, dn)), i) =>
          // exact integer equality (the cross-engine stability claim)
          assert(BigInt(row._2.toBigInteger) == want,
            s"curve $c step $i: got ${row._2}, fold says $want")
          assert(row._3 == (want / 1000000).toLong,
            s"curve $c step $i micro: got ${row._3}")
          // floor fold only loses: exact·Carry ≥ acc ≥ exact·Carry − i−1
          val exactScaled = nm * Carry / dn // floor of the true product
          assert(want <= exactScaled && want >= exactScaled - (i + 1),
            s"curve $c step $i envelope: acc=$want exact=$exactScaled")
      }
      // a kill-all step (d == n_risk) zeroes survival exactly, forever
      val killIdx = ordered.indexWhere { case (n, d) => d == n }
      if (killIdx >= 0)
        rows.drop(killIdx).foreach(r =>
          assert(r._3 == 0L && r._2.signum == 0))
    }
  }
}
