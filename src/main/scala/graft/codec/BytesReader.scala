package graft.codec

/** Big-endian cursor over one wire message (reference:
  * pgcapture pkg/decode/bytes.go:9-123). Pure JVM, zero-copy for
  * sub-slices where possible; throws `CodecException` on underflow so a
  * torn message fails loudly instead of mis-parsing.
  */
final class BytesReader(val buf: Array[Byte], private var pos: Int = 0) {

  def remaining: Int = buf.length - pos
  def offset: Int = pos

  private def need(n: Int): Unit =
    // n < 0 catches corrupt negative lengths; the subtraction form
    // (not pos + n > length) cannot overflow to a false pass
    if (n < 0 || buf.length - pos < n)
      throw new CodecException(
        s"buffer underflow: need $n bytes at offset $pos of ${buf.length}")

  def byte(): Byte = { need(1); val b = buf(pos); pos += 1; b }

  def uint8(): Int = byte() & 0xff

  def int16(): Short = {
    need(2)
    val v = ((buf(pos) & 0xff) << 8) | (buf(pos + 1) & 0xff)
    pos += 2
    v.toShort
  }

  def uint16(): Int = int16() & 0xffff

  def int32(): Int = {
    need(4)
    val v = ((buf(pos) & 0xff) << 24) | ((buf(pos + 1) & 0xff) << 16) |
      ((buf(pos + 2) & 0xff) << 8) | (buf(pos + 3) & 0xff)
    pos += 4
    v
  }

  def uint32(): Long = int32() & 0xffffffffL

  def int64(): Long = {
    need(8)
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (buf(pos + i) & 0xffL); i += 1 }
    pos += 8
    v
  }

  def bytes(n: Int): Array[Byte] = {
    need(n)
    val out = java.util.Arrays.copyOfRange(buf, pos, pos + n)
    pos += n
    out
  }

  /** Int32 length-prefixed byte string (pg wire "Bytes32"). Length −1
    * yields null (SQL NULL datum). */
  def bytes32(): Array[Byte] = {
    val n = int32()
    if (n < 0) null else bytes(n)
  }

  /** uint8 length-prefixed string. */
  def string8(): String = new String(bytes(uint8()), "UTF-8")

  /** uint16 length-prefixed string. */
  def string16(): String = new String(bytes(uint16()), "UTF-8")

  /** NUL-terminated C string (pgoutput's String type). */
  def cstring(): String = {
    var end = pos
    while (end < buf.length && buf(end) != 0) end += 1
    if (end >= buf.length)
      throw new CodecException(s"unterminated cstring at offset $pos")
    val s = new String(buf, pos, end - pos, "UTF-8")
    pos = end + 1
    s
  }

  /** Everything from the cursor to the end of the message. */
  def stringEnd(): String = {
    val s = new String(buf, pos, buf.length - pos, "UTF-8")
    pos = buf.length
    s
  }
}

final class CodecException(msg: String) extends RuntimeException(msg)

/** Big-endian growable writer — the encoder-side mirror of
  * [[BytesReader]], used to build wire fixtures and the file-backed WAL
  * feed for the streaming source.
  */
final class BytesWriter {
  private val out = new java.io.ByteArrayOutputStream(64)

  def byte(b: Byte): this.type = { out.write(b); this }
  def uint8(v: Int): this.type = { out.write(v & 0xff); this }
  def int16(v: Int): this.type = { out.write((v >> 8) & 0xff); out.write(v & 0xff); this }
  def int32(v: Int): this.type = {
    out.write((v >> 24) & 0xff); out.write((v >> 16) & 0xff)
    out.write((v >> 8) & 0xff); out.write(v & 0xff); this
  }
  def int64(v: Long): this.type = {
    var i = 7
    while (i >= 0) { out.write(((v >> (i * 8)) & 0xff).toInt); i -= 1 }
    this
  }
  def raw(b: Array[Byte]): this.type = { out.write(b, 0, b.length); this }
  def bytes32(b: Array[Byte]): this.type =
    if (b == null) int32(-1) else { int32(b.length); raw(b) }
  def cstring(s: String): this.type = { raw(s.getBytes("UTF-8")); out.write(0); this }
  def result(): Array[Byte] = out.toByteArray
}
