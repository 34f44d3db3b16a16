package graft.codec

import java.math.{BigDecimal => JBigDecimal, BigInteger, MathContext}
import java.time.{Instant, LocalDate}
import java.util.UUID

import org.apache.spark.sql.types._

/** PostgreSQL binary wire-format codec, per type OID.
  *
  * Covers the reference's demonstrated matrix (SURVEY §1.3; reference
  * python/pgcapture/decoders.py:157-230 and the binary pass-through in
  * pkg/sink/postgres.go:426-434) plus `numeric`, which the reference
  * explicitly punts on (decoders.py:211) but the TPC-H-ish oracle data
  * requires. Wire layouts are the public PostgreSQL binary send/recv
  * formats (documented in the PG source for each type's *send
  * function); all integers big-endian.
  *
  * Decode returns JVM values Catalyst encodes natively: Boolean, Short,
  * Int, Long, Float, Double, String, Array[Byte], LocalDate, Instant,
  * java.math.BigDecimal, Seq[Any] (1-D arrays). Encode is the exact
  * inverse, used for wire fixtures, the round-trip tests, and the
  * file-backed WAL feed.
  */
object PgType {

  // scalar OIDs
  val Bool = 16; val Bytea = 17; val Int8 = 20; val Int2 = 21; val Int4 = 23
  val Text = 25; val Json = 114; val Float4 = 700; val Float8 = 701
  val Bpchar = 1042; val Varchar = 1043; val Date = 1082; val Time = 1083
  val Timestamp = 1114; val Timestamptz = 1184; val Interval = 1186
  val Numeric = 1700; val Uuid = 2950; val Jsonb = 3802

  // 1-D array OIDs → element OID
  val arrayElem: Map[Int, Int] = Map(
    1000 -> Bool, 1001 -> Bytea, 1005 -> Int2, 1007 -> Int4, 1016 -> Int8,
    1009 -> Text, 199 -> Json, 1021 -> Float4, 1022 -> Float8,
    1014 -> Bpchar, 1015 -> Varchar, 1182 -> Date, 1183 -> Time,
    1115 -> Timestamp, 1185 -> Timestamptz, 1187 -> Interval,
    1231 -> Numeric, 2951 -> Uuid, 3807 -> Jsonb)
  val elemToArray: Map[Int, Int] = arrayElem.map(_.swap)

  /** µs between PG epoch 2000-01-01 and Unix epoch 1970-01-01
    * (reference pkg/sink/postgres.go:718-731). */
  final val PgEpochMicros = 946684800000000L
  /** days between 1970-01-01 and 2000-01-01. */
  final val PgEpochDays = 10957

  /** Catalyst type for a given OID (SURVEY §1.3 mapping). */
  def sparkType(oid: Int): DataType = oid match {
    case Bool => BooleanType
    case Bytea => BinaryType
    case Int2 => ShortType
    case Int4 => IntegerType
    case Int8 => LongType
    case Float4 => FloatType
    case Float8 => DoubleType
    case Text | Varchar | Bpchar | Json | Jsonb | Uuid => StringType
    case Date => DateType
    case Time => LongType // µs of day
    case Timestamp | Timestamptz => TimestampType
    case Interval => CalendarIntervalType
    case Numeric => DecimalType(38, 18)
    case a if arrayElem.contains(a) => ArrayType(sparkType(arrayElem(a)))
    case other => throw new CodecException(s"unsupported OID $other")
  }

  // ---------------------------------------------------------------- decode

  /** Decode one binary datum. `null` input (wire length −1) is SQL NULL. */
  def decode(oid: Int, datum: Array[Byte]): Any = {
    if (datum == null) return null
    val r = new BytesReader(datum)
    oid match {
      case Bool => r.byte() != 0
      case Bytea => datum
      case Int2 => r.int16()
      case Int4 => r.int32()
      case Int8 => r.int64()
      case Float4 => java.lang.Float.intBitsToFloat(r.int32())
      case Float8 => java.lang.Double.longBitsToDouble(r.int64())
      case Text | Varchar | Bpchar | Json => new String(datum, "UTF-8")
      case Jsonb =>
        val ver = r.byte() // jsonb binary = 1-byte version (1) + json text
        if (ver != 1) throw new CodecException(s"jsonb version $ver")
        r.stringEnd()
      case Uuid =>
        new UUID(r.int64(), r.int64()).toString
      case Date => LocalDate.ofEpochDay(r.int32().toLong + PgEpochDays)
      case Time => r.int64()
      case Timestamp | Timestamptz =>
        val us = r.int64() + PgEpochMicros
        Instant.ofEpochSecond(Math.floorDiv(us, 1000000L),
          Math.floorMod(us, 1000000L) * 1000L)
      case Interval =>
        // interval_send: i64 µs, i32 days, i32 months — exactly
        // Catalyst's CalendarInterval (months, days, microseconds)
        val us = r.int64(); val days = r.int32(); val months = r.int32()
        new org.apache.spark.unsafe.types.CalendarInterval(months, days, us)
      case Numeric => decodeNumeric(r)
      case a if arrayElem.contains(a) => decodeArray(r, arrayElem(a))
      case other => throw new CodecException(s"unsupported OID $other")
    }
  }

  /** numeric wire: i16 ndigits, i16 weight, u16 sign, u16 dscale, then
    * ndigits base-10000 digit groups. Sign 0xC000 = NaN → null (Spark
    * DecimalType has no NaN). */
  private def decodeNumeric(r: BytesReader): JBigDecimal = {
    val nd = r.uint16(); val weight = r.int16().toInt
    val sign = r.uint16(); val dscale = r.uint16()
    if (sign == 0xC000) return null
    var unscaled = BigInteger.ZERO
    val base = BigInteger.valueOf(10000L)
    var i = 0
    while (i < nd) {
      unscaled = unscaled.multiply(base).add(BigInteger.valueOf(r.uint16().toLong))
      i += 1
    }
    // value = unscaled · 10000^(weight − nd + 1)
    val exp = (weight - nd + 1) * 4
    var bd = new JBigDecimal(unscaled)
    bd = bd.movePointRight(exp)
    bd = bd.setScale(dscale)
    if (sign == 0x4000) bd.negate() else bd
  }

  /** 1-D array wire: i32 ndims, i32 hasnull, i32 elemOid, per-dim
    * (i32 len, i32 lbound), then per element i32 len + bytes. */
  private def decodeArray(r: BytesReader, elemOid: Int): Seq[Any] = {
    val ndims = r.int32()
    r.int32() // hasnull flag — recomputed from elements
    val wireElem = r.int32()
    if (ndims == 0) return Seq.empty
    if (ndims != 1)
      throw new CodecException(s"only 1-D arrays supported, got $ndims dims")
    val len = r.int32()
    r.int32() // lower bound
    val effOid = if (wireElem != 0) wireElem else elemOid
    (0 until len).map(_ => decode(effOid, r.bytes32()))
  }

  // ---------------------------------------------------------------- encode

  /** Encode one JVM value to the binary wire datum; null → null (wire −1). */
  def encode(oid: Int, value: Any): Array[Byte] = {
    if (value == null) return null
    val w = new BytesWriter
    oid match {
      case Bool => w.byte(if (value.asInstanceOf[Boolean]) 1 else 0)
      case Bytea => w.raw(value.asInstanceOf[Array[Byte]])
      case Int2 => w.int16(value.asInstanceOf[Short].toInt)
      case Int4 => w.int32(value.asInstanceOf[Int])
      case Int8 => w.int64(value.asInstanceOf[Long])
      case Float4 => w.int32(java.lang.Float.floatToIntBits(value.asInstanceOf[Float]))
      case Float8 => w.int64(java.lang.Double.doubleToLongBits(value.asInstanceOf[Double]))
      case Text | Varchar | Bpchar | Json => w.raw(value.toString.getBytes("UTF-8"))
      case Jsonb => w.byte(1).raw(value.toString.getBytes("UTF-8"))
      case Uuid =>
        val u = UUID.fromString(value.toString)
        w.int64(u.getMostSignificantBits).int64(u.getLeastSignificantBits)
      case Date =>
        w.int32((value.asInstanceOf[LocalDate].toEpochDay - PgEpochDays).toInt)
      case Time => w.int64(value.asInstanceOf[Long])
      case Timestamp | Timestamptz =>
        val inst = value.asInstanceOf[Instant]
        val us = Math.multiplyExact(inst.getEpochSecond, 1000000L) +
          inst.getNano / 1000L
        w.int64(us - PgEpochMicros)
      case Interval =>
        val iv = value.asInstanceOf[org.apache.spark.unsafe.types.CalendarInterval]
        w.int64(iv.microseconds).int32(iv.days).int32(iv.months)
      case Numeric => encodeNumeric(w, value.asInstanceOf[JBigDecimal])
      case a if arrayElem.contains(a) =>
        encodeArray(w, arrayElem(a), value.asInstanceOf[Seq[Any]])
      case other => throw new CodecException(s"unsupported OID $other")
    }
    w.result()
  }

  private def encodeNumeric(w: BytesWriter, bd0: JBigDecimal): Unit = {
    val bd = bd0.stripTrailingZeros()
    val dscale = math.max(bd0.scale(), 0)
    val neg = bd.signum() < 0
    val abs = bd.abs()
    // left-pad the unscaled decimal string so both ends align to 4-digit
    // base-10000 groups around the decimal point
    val scale4 = ((abs.scale() + 3) / 4) * 4
    val aligned = abs.setScale(scale4)
    val digitsStr = aligned.unscaledValue().toString
    val pad = (4 - (digitsStr.length - scale4) % 4) % 4
    val full = ("0" * pad) + digitsStr
    val groups = full.grouped(4).map(_.toInt).toArray
    val weight = (full.length - scale4) / 4 - 1
    // trim leading/trailing zero groups
    var lo = 0; var hi = groups.length
    while (lo < hi && groups(lo) == 0) lo += 1
    while (hi > lo && groups(hi - 1) == 0) hi -= 1
    val nd = hi - lo
    w.int16(nd)
    w.int16(if (nd == 0) 0 else weight - lo)
    w.int16(if (neg) 0x4000 else 0)
    w.int16(dscale)
    var i = lo
    while (i < hi) { w.int16(groups(i)); i += 1 }
  }

  private def encodeArray(w: BytesWriter, elemOid: Int, xs: Seq[Any]): Unit = {
    w.int32(1) // ndims
    w.int32(if (xs.exists(_ == null)) 1 else 0)
    w.int32(elemOid)
    w.int32(xs.length)
    w.int32(1) // lower bound
    xs.foreach(x => w.bytes32(encode(elemOid, x)))
  }
}
