package graft.codec

import java.math.{BigDecimal => JBigDecimal}
import java.time.{Instant, LocalDate}

import org.apache.spark.unsafe.types.CalendarInterval
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Randomized wire-codec round-trip: decode(encode(v)) must be v for
  * every supported OID, over value ranges far beyond the fixture
  * corpus (negative epochs, NaN/±Inf bit patterns, unicode, null
  * array elements, 30-digit decimals). Seeded scalacheck, no Spark
  * session — each case is a pure byte-array round-trip. */
class CodecPropertySpec extends AnyFunSuite {

  private def check(name: String, p: Prop): Unit = {
    val params = SCTest.Parameters.default
      .withMinSuccessfulTests(300)
      .withInitialSeed(Seed(4242L))
    val res = SCTest.check(params, p)
    assert(res.passed, s"$name: ${res.status}")
  }

  private def rt(oid: Int, v: Any): Any = PgType.decode(oid, PgType.encode(oid, v))

  private def same(a: Any, b: Any): Boolean = (a, b) match {
    case (x: Array[Byte], y: Array[Byte]) => java.util.Arrays.equals(x, y)
    case (x: Seq[_], y: Seq[_]) =>
      x.length == y.length && x.zip(y).forall { case (u, v) => same(u, v) }
    case (x, y) => x == y
  }

  private val unicodeStr = Gen.listOf(Gen.frequency(
    8 -> Gen.alphaNumChar, 1 -> Gen.const('√'), 1 -> Gen.const('ß'),
    1 -> Gen.const(' '), 1 -> Gen.const('\n'))).map(_.mkString)

  test("scalar OIDs round-trip bit-exactly") {
    check("bool", Prop.forAll((b: Boolean) => rt(PgType.Bool, b) == b))
    check("int2", Prop.forAll((v: Short) => rt(PgType.Int2, v) == v))
    check("int4", Prop.forAll((v: Int) => rt(PgType.Int4, v) == v))
    check("int8", Prop.forAll((v: Long) => rt(PgType.Int8, v) == v))
    // floats compare by BITS so NaN payloads and -0.0 must survive
    check("float4", Prop.forAll(Gen.oneOf(
      Gen.chooseNum(Float.MinValue, Float.MaxValue),
      Gen.oneOf(Float.NaN, Float.PositiveInfinity, -0.0f))) { v =>
      java.lang.Float.floatToRawIntBits(rt(PgType.Float4, v).asInstanceOf[Float]) ==
        java.lang.Float.floatToRawIntBits(v)
    })
    check("float8", Prop.forAll(Gen.oneOf(
      Gen.chooseNum(Double.MinValue, Double.MaxValue),
      Gen.oneOf(Double.NaN, Double.NegativeInfinity, -0.0d))) { v =>
      java.lang.Double.doubleToRawLongBits(rt(PgType.Float8, v).asInstanceOf[Double]) ==
        java.lang.Double.doubleToRawLongBits(v)
    })
    check("text", Prop.forAll(unicodeStr)(s => rt(PgType.Text, s) == s))
    check("jsonb", Prop.forAll(unicodeStr)(s =>
      rt(PgType.Jsonb, s"""{"k":"$s"}""".replace("\n", "")) ==
        s"""{"k":"$s"}""".replace("\n", "")))
    check("bytea", Prop.forAll(Gen.listOf(Gen.chooseNum(Byte.MinValue,
      Byte.MaxValue))) { bs =>
      same(rt(PgType.Bytea, bs.toArray), bs.toArray)
    })
    check("uuid", Prop.forAll(Gen.long, Gen.long) { (hi, lo) =>
      val u = new java.util.UUID(hi, lo).toString
      rt(PgType.Uuid, u) == u
    })
  }

  test("temporal OIDs round-trip incl. pre-PG-epoch values") {
    check("date", Prop.forAll(Gen.chooseNum(-200000L, 200000L)) { d =>
      rt(PgType.Date, LocalDate.ofEpochDay(d)) == LocalDate.ofEpochDay(d)
    })
    check("time", Prop.forAll(Gen.chooseNum(0L, 86399999999L)) { us =>
      rt(PgType.Time, us) == us
    })
    // µs precision only — PG timestamps carry no nanos
    check("timestamp", Prop.forAll(
      Gen.chooseNum(-4000000000L, 4000000000L), Gen.chooseNum(0L, 999999L)) {
      (sec, us) =>
        val v = Instant.ofEpochSecond(sec, us * 1000L)
        rt(PgType.Timestamptz, v) == v
    })
    check("interval", Prop.forAll(Gen.chooseNum(-1200, 1200),
      Gen.chooseNum(-100000, 100000), Gen.chooseNum(-1000000000L, 1000000000L)) {
      (months, days, us) =>
        val v = new CalendarInterval(months, days, us)
        rt(PgType.Interval, v) == v
    })
  }

  test("numeric round-trips value AND scale across base-10000 alignment") {
    val gen = for {
      digits <- Gen.chooseNum(1, 30)
      neg <- Gen.oneOf(true, false)
      unscaled <- Gen.listOfN(digits, Gen.numChar).map(_.mkString)
      scale <- Gen.chooseNum(0, 18)
    } yield new JBigDecimal(new java.math.BigInteger(
      (if (neg) "-" else "") + unscaled), scale)
    check("numeric", Prop.forAll(gen) { bd =>
      val back = rt(PgType.Numeric, bd).asInstanceOf[JBigDecimal]
      back == bd // equals: same value AND same scale
    })
    assert(rt(PgType.Numeric, new JBigDecimal("0.00")) ==
      new JBigDecimal("0.00"))
  }

  test("1-D arrays round-trip incl. null elements") {
    check("int8[]", Prop.forAll(Gen.listOf(Gen.option(Gen.long))) { xs =>
      val v: Seq[Any] = xs.map(_.orNull)
      same(rt(PgType.elemToArray(PgType.Int8), v), v)
    })
    check("text[]", Prop.forAll(Gen.listOf(Gen.option(unicodeStr))) { xs =>
      val v: Seq[Any] = xs.map(_.orNull)
      same(rt(PgType.elemToArray(PgType.Text), v), v)
    })
    check("numeric[]", Prop.forAll(Gen.listOf(Gen.option(
      Gen.chooseNum(-1000000L, 1000000L)))) { xs =>
      val v: Seq[Any] = xs.map(_.map(l =>
        new JBigDecimal(java.math.BigInteger.valueOf(l), 4)).orNull)
      same(rt(PgType.elemToArray(PgType.Numeric), v), v)
    })
  }
}
