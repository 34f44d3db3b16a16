package graft.codec

import java.math.{BigDecimal => JBigDecimal}
import java.time.{Instant, LocalDate}

import org.scalatest.funsuite.AnyFunSuite

import PgType._
import PgOutput.{Column => C, Relation => R}

/** Wire-codec round-trips per FIXTURES.md §1: the reference's canonical
  * decode-test table t(id int8 pk, uid uuid, txt text, js jsonb,
  * ts timestamptz, bs bytea) incl. the 500 kB TOAST case and the
  * NULL-vs-unchanged-TOAST distinction
  * (reference pkg/decode/pgoutput_test.go:21-120).
  */
class CodecSpec extends AnyFunSuite {

  private def rt(oid: Int, v: Any): Any = decode(oid, encode(oid, v))

  test("scalar round-trips: ints, floats, bool, text") {
    assert(rt(Int2, 12345.toShort) == 12345.toShort)
    assert(rt(Int2, Short.MinValue) == Short.MinValue)
    assert(rt(Int4, -2000000000) == -2000000000)
    assert(rt(Int8, Long.MaxValue) == Long.MaxValue)
    assert(rt(Int8, Long.MinValue) == Long.MinValue)
    assert(rt(Float4, 3.14f) == 3.14f)
    assert(rt(Float8, -2.718281828459045) == -2.718281828459045)
    assert(java.lang.Double.isNaN(rt(Float8, Double.NaN).asInstanceOf[Double]))
    assert(rt(Bool, true) == true)
    assert(rt(Bool, false) == false)
    assert(rt(Text, "héllo wörld") == "héllo wörld")
    assert(rt(Varchar, "") == "")
  }

  test("randomized int/float/text round-trips (seeded)") {
    val rnd = new scala.util.Random(42)
    (0 until 500).foreach { _ =>
      val l = rnd.nextLong(); assert(rt(Int8, l) == l)
      val i = rnd.nextInt(); assert(rt(Int4, i) == i)
      val d = rnd.nextDouble() * math.pow(10, rnd.nextInt(20) - 10)
      assert(rt(Float8, d) == d)
      val s = rnd.alphanumeric.take(rnd.nextInt(50)).mkString
      assert(rt(Text, s) == s)
    }
  }

  test("uuid canonical form") {
    val u = "c4ca4238-a0b9-2382-0dcc-509a6f75849b"
    assert(rt(Uuid, u) == u)
    val wire = encode(Uuid, u)
    assert(wire.length == 16)
  }

  test("jsonb carries version byte + nested doc") {
    val js = """{"a":{"b":{"c":{"d":null}}}}"""
    val wire = encode(Jsonb, js)
    assert(wire(0) == 1)
    assert(decode(Jsonb, wire) == js)
  }

  test("bytea 500kB TOAST-sized value") {
    val big = Array.tabulate(500000)(i => (i * 31 + 7).toByte)
    assert(java.util.Arrays.equals(
      rt(Bytea, big).asInstanceOf[Array[Byte]], big))
  }

  test("date / time / timestamp epochs (PG Y2K epoch offset)") {
    val d = LocalDate.of(1996, 1, 2)
    assert(rt(Date, d) == d)
    // 2000-01-01 is wire 0
    assert(new BytesReader(encode(Date, LocalDate.of(2000, 1, 1))).int32() == 0)
    val ts = Instant.parse("2024-06-15T12:34:56.123456Z")
    assert(rt(Timestamptz, ts) == ts)
    // wire value is µs since 2000-01-01 (reference pkg/sink/postgres.go:718-731)
    val y2k = Instant.parse("2000-01-01T00:00:00Z")
    assert(new BytesReader(encode(Timestamp, y2k)).int64() == 0L)
    assert(rt(Time, 86399999999L) == 86399999999L)
  }

  test("numeric: base-10000 digit groups, signs, scales, zero") {
    for (s <- Seq("0", "0.00", "1", "-1", "1.5", "-12345.6789", "0.0001",
        "99999999.99", "123456789012345.678901", "10000", "0.5", "-0.07",
        "20000.0000", "1234.5000")) {
      val bd = new JBigDecimal(s)
      val got = rt(Numeric, bd).asInstanceOf[JBigDecimal]
      assert(got.compareTo(bd) == 0, s"value $s -> $got")
      assert(got.scale() == math.max(bd.scale(), 0), s"scale of $s -> ${got.scale}")
    }
    // NaN (sign 0xC000) decodes to null
    val nan = new BytesWriter().int16(0).int16(0).int16(0xC000).int16(0).result()
    assert(decode(Numeric, nan) == null)
  }

  test("randomized numeric round-trip (seeded)") {
    val rnd = new scala.util.Random(7)
    (0 until 1000).foreach { _ =>
      val bd = JBigDecimal.valueOf(
        rnd.nextLong() % 1000000000000000L, rnd.nextInt(11))
      assert(rt(Numeric, bd).asInstanceOf[JBigDecimal].compareTo(bd) == 0,
        s"numeric $bd")
    }
  }

  test("1-D arrays incl. null elements") {
    assert(rt(elemToArray(Int8), Seq(1L, 2L, null, -5L)) == Seq(1L, 2L, null, -5L))
    assert(rt(elemToArray(Text), Seq("a", "", "c")) == Seq("a", "", "c"))
    assert(rt(elemToArray(Float8), Seq.empty[Any]) == Seq.empty)
  }

  test("null datum is SQL NULL end-to-end") {
    assert(encode(Text, null) == null)
    assert(decode(Text, null) == null)
  }

  test("decoders fail cleanly on garbage frames (seeded fuzz)") {
    // a malicious/corrupt feed must produce CodecException, never raw
    // index/allocation errors, hangs, or huge allocations
    val rnd = new scala.util.Random(99)
    val decoders = Seq(
      () => new graft.codec.PgOutput.Decoder,
      () => new graft.codec.PgLogical.Decoder)
    decoders.foreach { mk =>
      val d = mk()
      for (_ <- 1 to 4000) {
        val frame = new Array[Byte](rnd.nextInt(48))
        rnd.nextBytes(frame)
        // bias some frames toward real message tags to reach deeper code
        if (frame.nonEmpty && rnd.nextBoolean())
          frame(0) = "BCRIUD".charAt(rnd.nextInt(6)).toByte
        try { d.decode(frame); () }
        catch { case _: graft.codec.CodecException => () }
      }
    }
  }

  test("interval: (months, days, µs) triple incl. negatives (OID 1186)") {
    import org.apache.spark.unsafe.types.CalendarInterval
    val iv = new CalendarInterval(14, 3, 12 * 3600L * 1000000L + 30L)
    assert(rt(Interval, iv) == iv)
    val neg = new CalendarInterval(-1, -2, -3L)
    assert(rt(Interval, neg) == neg)
    assert(sparkType(Interval) ==
      org.apache.spark.sql.types.CalendarIntervalType)
    assert(rt(elemToArray(Interval), Seq(iv, null, neg)) == Seq(iv, null, neg))
  }

  // -------------------------------------------------------------- pgoutput

  private val fixtureRel = R(16385, "public", "t", 'd', Seq(
    C("id", Int8, isKey = true), C("uid", Uuid, isKey = false),
    C("txt", Text, isKey = false), C("js", Jsonb, isKey = false),
    C("ts", Timestamptz, isKey = false), C("bs", Bytea, isKey = false)))

  private val bigBytes = Array.tabulate(500000)(i => (i % 251).toByte)
  private val ts0 = Instant.parse("2024-01-01T00:00:07.179575Z")

  private def datums(id: Long): Seq[Array[Byte]] = Seq(
    encode(Int8, id), encode(Uuid, "c4ca4238-a0b9-2382-0dcc-509a6f75849b"),
    encode(Text, "hello"), encode(Jsonb, """{"a":{"b":{"c":{"d":null}}}}"""),
    encode(Timestamptz, ts0), encode(Bytea, bigBytes))

  test("pgoutput INSERT round-trip (FIXTURES §1 table t)") {
    val dec = new PgOutput.Decoder
    dec.decode(PgOutput.Encoder.relation(fixtureRel))
    val msg = dec.decode(PgOutput.Encoder.insert(fixtureRel, datums(1L)))
    val ch = msg.asInstanceOf[PgOutput.Change]
    assert(ch.op == "INSERT" && ch.rel.name == "t")
    val nf = ch.newTuple.get
    assert(decode(Int8, nf("id")) == 1L)
    assert(decode(Text, nf("txt")) == "hello")
    assert(decode(Timestamptz, nf("ts")) == ts0)
    assert(java.util.Arrays.equals(nf("bs"), encode(Bytea, bigBytes)))
  }

  test("pgoutput UPDATE: NULL vs unchanged-TOAST distinction") {
    // UPDATE sets txt=NULL and leaves bs unchanged (TOAST, 'u' byte):
    // txt must be present-with-null, bs ABSENT (reference decoder.go:98-115)
    val dec = new PgOutput.Decoder
    dec.decode(PgOutput.Encoder.relation(fixtureRel))
    val newDatums = Seq(encode(Int8, 1L), datums(1L)(1), null, datums(1L)(3),
      datums(1L)(4), PgOutput.Encoder.Toast)
    val keyOld = Seq(encode(Int8, 1L), null, null, null, null, null)
    val msg = dec.decode(PgOutput.Encoder.update(fixtureRel, Some(keyOld), newDatums))
    val ch = msg.asInstanceOf[PgOutput.Change]
    val nf = ch.newTuple.get
    assert(nf.contains("txt") && nf("txt") == null, "NULL must be present-with-null")
    assert(!nf.contains("bs"), "unchanged TOAST must be an absent key")
    // old image drops NULL columns entirely (key-only)
    assert(ch.oldTuple.get.keySet == Set("id"))
  }

  test("pgoutput UPDATE with replica identity FULL back-fills TOAST") {
    val relF = fixtureRel.copy(relId = 16386, name = "t2", replicaIdentity = 'f')
    val dec = new PgOutput.Decoder
    dec.decode(PgOutput.Encoder.relation(relF))
    val fullOld = datums(1L)
    val newDatums = Seq(encode(Int8, 1L), fullOld(1), encode(Text, "updated"),
      fullOld(3), fullOld(4), PgOutput.Encoder.Toast)
    val msg = dec.decode(PgOutput.Encoder.update(relF, Some(fullOld), newDatums, 'O'))
    val nf = msg.asInstanceOf[PgOutput.Change].newTuple.get
    assert(nf.contains("bs"), "replica identity FULL back-fills unchanged TOAST")
    assert(java.util.Arrays.equals(nf("bs"), encode(Bytea, bigBytes)))
    assert(decode(Text, nf("txt")) == "updated")
  }

  test("pgoutput DELETE carries key-only old tuple") {
    val dec = new PgOutput.Decoder
    dec.decode(PgOutput.Encoder.relation(fixtureRel))
    val msg = dec.decode(PgOutput.Encoder.delete(fixtureRel,
      Seq(encode(Int8, 7L), null, null, null, null, null)))
    val ch = msg.asInstanceOf[PgOutput.Change]
    assert(ch.op == "DELETE" && ch.newTuple.isEmpty)
    assert(decode(Int8, ch.oldTuple.get("id")) == 7L)
  }

  test("pgoutput 't' text-format datums parse alongside 'b'") {
    // servers without `binary` option send text-format datums ('t');
    // build the tuple by hand since the fixture encoder emits 'b'
    val dec = new PgOutput.Decoder
    dec.decode(PgOutput.Encoder.relation(fixtureRel))
    val idTxt = "42".getBytes("UTF-8")
    val w = new BytesWriter().byte('I').int32(fixtureRel.relId).byte('N')
      .int16(6)
      .byte('t').int32(idTxt.length).raw(idTxt) // id as text datum
      .byte('n').byte('n').byte('n').byte('n').byte('n')
    val ch = dec.decode(w.result()).asInstanceOf[PgOutput.Change]
    assert(new String(ch.newTuple.get("id"), "UTF-8") == "42",
      "text datum carried through as raw bytes")
    assert(ch.newTuple.get("txt") == null)
  }

  test("pgoutput Begin/Commit framing") {
    val dec = new PgOutput.Decoder
    val b = dec.decode(PgOutput.Encoder.begin(0x16B374D848L, 123456789L, 42))
    assert(b == PgOutput.Begin(0x16B374D848L, 123456789L, 42))
    val c = dec.decode(PgOutput.Encoder.commit(0x16B374D848L, 0x16B374D900L, 99L))
    assert(c == PgOutput.Commit(0x16B374D848L, 0x16B374D900L, 99L))
  }

  test("unknown relation id fails loudly") {
    val dec = new PgOutput.Decoder
    intercept[CodecException] {
      dec.decode(PgOutput.Encoder.insert(fixtureRel, datums(1L)))
    }
  }

  test("BytesReader underflow and cstring termination fail loudly") {
    intercept[CodecException] { new BytesReader(Array[Byte](1, 2)).int32() }
    intercept[CodecException] { new BytesReader(Array[Byte]('a', 'b')).cstring() }
  }

  test("truncate decodes first-class (r14 ask #1): relids resolve, flags parse") {
    val dec = new PgOutput.Decoder
    val r7 = fixtureRel.copy(relId = 7, name = "t7")
    val r8 = fixtureRel.copy(relId = 8, name = "t8")
    dec.decode(PgOutput.Encoder.relation(r7))
    dec.decode(PgOutput.Encoder.relation(r8))
    // CASCADE (bit 1) + RESTART IDENTITY (bit 2); relid order preserved
    dec.decode(PgOutput.Encoder.truncate(Seq(8, 7), optionBits = 3)) match {
      case PgOutput.Truncate(rels, cascade, restart) =>
        assert(rels.map(_.name) == Seq("t8", "t7"))
        assert(cascade && restart)
      case other => fail(s"expected Truncate, got $other")
    }
    dec.decode(PgOutput.Encoder.truncate(Seq(7), optionBits = 0)) match {
      case PgOutput.Truncate(rels, cascade, restart) =>
        assert(rels.map(_.relId) == Seq(7) && !cascade && !restart)
      case other => fail(s"expected Truncate, got $other")
    }
    // an undeclared relid fails loudly, same contract as I/U/D
    intercept[CodecException](
      dec.decode(PgOutput.Encoder.truncate(Seq(99), optionBits = 0)))
  }

  test("logical message decodes first-class (r15): flags, lsn, prefix, content") {
    val dec = new PgOutput.Decoder
    val payload = "release-gate:42".getBytes("UTF-8")
    dec.decode(PgOutput.Encoder.message(transactional = true, 0xABCDL,
      "audit", payload)) match {
      case PgOutput.LogicalMessage(txn, lsn, prefix, content) =>
        assert(txn && lsn == 0xABCDL && prefix == "audit")
        assert(content.sameElements(payload))
      case other => fail(s"expected LogicalMessage, got $other")
    }
    dec.decode(PgOutput.Encoder.message(transactional = false, 1L,
      "ctl", Array.emptyByteArray)) match {
      case PgOutput.LogicalMessage(txn, _, prefix, content) =>
        assert(!txn && prefix == "ctl" && content.isEmpty)
      case other => fail(s"expected LogicalMessage, got $other")
    }
    // a malformed 'M' frame fails loudly like malformed I/U/D — 'M'
    // is a KNOWN tag now, not an Unknown skip
    intercept[CodecException](dec.decode('M'.toByte +: Array[Byte](1, 2)))
  }

  test("unknown tags decode to Unknown, never throw (r13 ask #4)") {
    val dec = new PgOutput.Decoder
    assert(dec.decode(PgOutput.Encoder.origin(0x10L, "node_1"))
      == PgOutput.Unknown('O'))
    // tag-only frames with arbitrary payloads: 'Y' type and the PG14
    // streaming tags ('S'tream start, 'E'nd, 'A'bort) — the decoder
    // must classify by tag without reading the body ('T' and 'M' left
    // this set in r15: both are first-class messages now)
    for (tag <- Seq('Y', 'S', 'E', 'A'))
      assert(dec.decode(tag.toByte +: Array[Byte](1, 2, 3))
        == PgOutput.Unknown(tag))
  }
}
