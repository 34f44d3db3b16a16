package graft.cdc

import graft.SparkTestSession
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** The (lsn, seq) cursor's total order is UNSIGNED in the lsn — the
  * reference's contract — and three implementations of it must agree:
  * Checkpoint.compare (driver side), afterCheckpoint's XOR-flipped
  * column filter (executor side), and checkpointOrder's sort columns.
  * Properties sample the full unsigned range including the 2⁶³
  * boundary where a signed comparison inverts. */
class CheckpointPropertySpec extends AnyFunSuite {

  private def check(name: String, p: Prop): Unit = {
    val params = SCTest.Parameters.default
      .withMinSuccessfulTests(300)
      .withInitialSeed(Seed(1234L))
    val res = SCTest.check(params, p)
    assert(res.passed, s"$name: ${res.status}")
  }

  private def unsigned(l: Long): BigInt =
    (BigInt(l >>> 1) << 1) | (l & 1L)

  // full-range lsn generator: uniform longs plus the adversarial edge
  private val lsnGen = Gen.frequency(
    6 -> Gen.long,
    1 -> Gen.oneOf(0L, 1L, -1L, Long.MinValue, Long.MaxValue,
      Long.MinValue + 1, Long.MaxValue - 1))
  private val cpGen = for {
    lsn <- lsnGen; seq <- Gen.chooseNum(0, Int.MaxValue)
  } yield Checkpoint(lsn, seq)

  test("serialize/parse round-trips the full unsigned range") {
    check("serde", Prop.forAll(cpGen) { cp =>
      Checkpoint.parse(cp.serialize) == cp
    })
  }

  test("compare == (unsigned lsn, seq) lexicographic order") {
    check("order", Prop.forAll(cpGen, cpGen) { (a, b) =>
      val want = Ordering.Tuple2[BigInt, Int].compare(
        (unsigned(a.lsn), a.seq), (unsigned(b.lsn), b.seq))
      Integer.signum(a.compare(b)) == Integer.signum(want) &&
        a.after(b) == (want > 0)
    })
  }

  test("column-side filter and sort agree with Checkpoint.compare at 2^63") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val cps = (Seq(0L, 1L, -1L, Long.MinValue, Long.MaxValue,
      Long.MinValue + 1, (1L << 62), -(1L << 62)).flatMap(l =>
        Seq(Checkpoint(l, 0), Checkpoint(l, 7))) ++
      Seq.fill(180)(Checkpoint(rnd.nextLong(), rnd.nextInt(100)))).distinct
    val df = cps.map(c => (c.lsn, c.seq)).toDF("lsn", "seq")

    // afterCheckpoint ≡ driver-side .after for watermarks straddling
    // the signed/unsigned boundary
    val watermarks = Seq(Checkpoint.Zero, Checkpoint(Long.MaxValue, 3),
      Checkpoint(Long.MinValue, 0), Checkpoint(-1L, 2),
      Checkpoint(1L << 62, 7)) ++ Seq.fill(10)(
      Checkpoint(rnd.nextLong(), rnd.nextInt(100)))
    watermarks.foreach { wm =>
      val got = CdcApply.afterCheckpoint(df, wm)
        .collect().map(r => Checkpoint(r.getLong(0), r.getInt(1))).toSet
      val want = cps.filter(_.after(wm)).toSet
      assert(got == want,
        s"filter disagrees with compare at watermark $wm: " +
          s"missing=${want -- got} extra=${got -- want}")
    }

    // checkpointOrder ≡ sorting by Checkpoint.compare
    val sorted = df.orderBy(CdcApply.checkpointOrder(): _*)
      .collect().map(r => Checkpoint(r.getLong(0), r.getInt(1))).toSeq
    assert(sorted == cps.sorted,
      "checkpointOrder must sort in Checkpoint.compare order")
  }
}
