package graft.codec

import scala.collection.mutable

/** pgoutput logical-replication message codec (public PostgreSQL
  * protocol: "Logical Replication Message Formats"; reference decoder
  * at pkg/decode/pgoutput.go:33-159, byte cursor pkg/decode/bytes.go).
  *
  * The decoder is stateful — Relation ('R') messages establish the
  * relid → (namespace, name, columns) mapping that Insert/Update/Delete
  * messages reference — mirroring the reference's relations map.
  *
  * Tuple semantics (reference pkg/decode/decoder.go:56-118):
  *  - format byte 'n' → SQL NULL (key present, value null)
  *  - format byte 'u' → unchanged TOAST (key ABSENT from the map)
  *  - 'b' binary datum / 't' text datum → raw bytes
  *  - old tuple: NULL columns dropped (key-only old images)
  *  - new tuple under replica identity FULL: unchanged-TOAST columns
  *    back-filled from the old image
  */
object PgOutput {

  final case class Column(name: String, oid: Int, isKey: Boolean)
  final case class Relation(relId: Int, namespace: String, name: String,
      replicaIdentity: Char, columns: Seq[Column])

  sealed trait Message
  final case class Begin(finalLsn: Long, commitTimeUs: Long, xid: Int) extends Message
  final case class Commit(commitLsn: Long, endLsn: Long, commitTimeUs: Long) extends Message
  final case class RelationMsg(rel: Relation) extends Message
  /** kind: 'N' new row, 'K' key-only old row, 'O' full old row. */
  final case class Change(op: String, rel: Relation,
      newTuple: Option[Map[String, Array[Byte]]],
      oldTuple: Option[Map[String, Array[Byte]]]) extends Message
  /** A TRUNCATE on published tables (wire tag 'T', PG11+). The relid
    * array already names EVERY affected relation — PostgreSQL expands
    * CASCADE server-side before emitting the frame — so applying a
    * per-relation clear reproduces cascade semantics without parsing
    * the flag; `restartIdentity` is a sequence concern with no
    * counterpart in the captured tables themselves. The reference
    * SKIPS this frame (pkg/decode/pgoutput.go:35-43 handles only
    * B/C/R/I/U/D), leaving replicas silently stale after a primary
    * truncate — promoted to first-class here (r14 ask #1). */
  final case class Truncate(rels: Seq[Relation], cascade: Boolean,
      restartIdentity: Boolean) extends Message
  /** A logical-decoding message (wire tag 'M', PG14+ with the
    * `messages 'true'` publication option): `pg_logical_emit_message`
    * payloads — app-level signals, watermarks, audit markers — that
    * ride the WAL. `transactional` messages are delivered inside
    * their transaction (and vanish with a rollback); non-transactional
    * ones arrive immediately between transactions. `msgLsn` is the
    * message's own WAL position from the frame. The reference skips
    * the frame (pkg/decode/pgoutput.go:35-43 handles only B/C/R/I/U/D);
    * promoted to a first-class op=MESSAGE control row here (r15). */
  final case class LogicalMessage(transactional: Boolean, msgLsn: Long,
      prefix: String, content: Array[Byte]) extends Message
  final case class Unknown(tag: Char) extends Message

  /** One tuple image: per-column datum plus the set of unchanged-TOAST
    * columns (absent keys downstream). */
  private final case class Tuple(values: Map[String, Array[Byte]],
      nulls: Set[String], toastUnchanged: Set[String])

  /** Common decoder contract for the logical-replication wire formats
    * (pgoutput here, pglogical in [[PgLogical]]) so the source and
    * everything downstream are plugin-agnostic. */
  trait WireDecoder {
    def decode(msg: Array[Byte]): Message
  }

  final class Decoder extends WireDecoder {
    private val relations = mutable.Map.empty[Int, Relation]

    def relation(relId: Int): Option[Relation] = relations.get(relId)

    def decode(msg: Array[Byte]): Message = {
      val r = new BytesReader(msg)
      (r.byte().toChar: @unchecked) match {
        case 'B' => Begin(r.int64(), r.int64(), r.int32())
        case 'C' =>
          r.byte() // flags, unused
          Commit(r.int64(), r.int64(), r.int64())
        case 'R' =>
          val relId = r.int32()
          val nsp = r.cstring()
          val name = r.cstring()
          val replident = r.byte().toChar
          val ncols = r.int16().toInt
          val cols = (0 until ncols).map { _ =>
            val flags = r.byte()
            val cname = r.cstring()
            val oid = r.int32()
            r.int32() // typmod
            Column(cname, oid, (flags & 1) != 0)
          }
          val rel = Relation(relId, nsp, name, replident, cols)
          relations(relId) = rel
          RelationMsg(rel)
        case 'I' =>
          val rel = rel0(r.int32())
          expect(r, 'N')
          val nt = readTuple(r, rel)
          Change("INSERT", rel, Some(project(nt, None, rel)), None)
        case 'U' =>
          val rel = rel0(r.int32())
          var old: Option[Tuple] = None
          var tag = r.byte().toChar
          if (tag == 'K' || tag == 'O') {
            old = Some(readTuple(r, rel))
            tag = r.byte().toChar
          }
          if (tag != 'N') throw new CodecException(s"expected N tuple, got $tag")
          val nt = readTuple(r, rel)
          Change("UPDATE", rel, Some(project(nt, old, rel)),
            old.map(o => oldImage(o)))
        case 'D' =>
          val rel = rel0(r.int32())
          val tag = r.byte().toChar
          if (tag != 'K' && tag != 'O')
            throw new CodecException(s"expected K/O tuple, got $tag")
          val ot = readTuple(r, rel)
          Change("DELETE", rel, None, Some(oldImage(ot)))
        case 'T' =>
          // Truncate: Int32 nrels, Int8 option bits (1 = CASCADE,
          // 2 = RESTART IDENTITY), Int32[] relids — public "Logical
          // Replication Message Formats". Relids resolve through the
          // same relation map as I/U/D (the server declares each
          // relation with an 'R' frame before first reference).
          val nrels = r.int32()
          val bits = r.byte()
          Truncate((0 until nrels).map(_ => rel0(r.int32())),
            cascade = (bits & 1) != 0, restartIdentity = (bits & 2) != 0)
        case 'M' =>
          // Logical message: Int8 flags (1 = transactional), Int64 the
          // message's WAL lsn, cstring prefix, Int32 length, content
          // (public "Logical Replication Message Formats", PG14+).
          val flags = r.byte()
          val msgLsn = r.int64()
          val prefix = r.cstring()
          val content = r.bytes(r.int32())
          LogicalMessage((flags & 1) != 0, msgLsn, prefix, content)
        case other => Unknown(other) // 'O'rigin, 'Y'(type), PG14 streaming
      }
    }

    private def rel0(relId: Int): Relation =
      relations.getOrElse(relId,
        throw new CodecException(s"unknown relation id $relId — no prior R message"))

    private def expect(r: BytesReader, tag: Char): Unit = {
      val t = r.byte().toChar
      if (t != tag) throw new CodecException(s"expected $tag tuple, got $t")
    }

    private def readTuple(r: BytesReader, rel: Relation): Tuple = {
      val ncols = r.int16().toInt
      val values = Map.newBuilder[String, Array[Byte]]
      val nulls = Set.newBuilder[String]
      val toast = Set.newBuilder[String]
      var i = 0
      while (i < ncols) {
        // columns beyond the cached schema are dropped, like the
        // reference's name-lookup projection (pkg/decode/decoder.go:56-68)
        val colName = if (i < rel.columns.length) rel.columns(i).name else null
        r.byte().toChar match {
          case 'n' => if (colName != null) nulls += colName
          case 'u' => if (colName != null) toast += colName
          case 'b' | 't' =>
            val datum = r.bytes(r.int32())
            if (colName != null) values += colName -> datum
          case other => throw new CodecException(s"bad tuple format byte '$other'")
        }
        i += 1
      }
      Tuple(values.result(), nulls.result(), toast.result())
    }

    /** New image: NULLs become present-with-null keys; unchanged TOAST
      * stays absent unless replica identity FULL provides the old value
      * (reference makeNewPBTuple, pkg/decode/decoder.go:98-115). */
    private def project(nt: Tuple, old: Option[Tuple],
        rel: Relation): Map[String, Array[Byte]] = {
      val base: Map[String, Array[Byte]] =
        nt.values ++ nt.nulls.map(_ -> (null: Array[Byte]))
      if (rel.replicaIdentity == 'f' && old.isDefined)
        base ++ nt.toastUnchanged.flatMap(c => old.get.values.get(c).map(c -> _))
      else base
    }

    /** Old image: NULL columns dropped entirely (reference
      * makeOldPBTuple, pkg/decode/decoder.go:70-79). */
    private def oldImage(t: Tuple): Map[String, Array[Byte]] = t.values
  }

  // -------------------------------------------------------------- encoder

  /** Builds wire-format pgoutput messages — the fixture generator for
    * round-trip tests, the q41/q42 codec queries, and the file-backed
    * WAL feed of the streaming source. Field order follows
    * `rel.columns`; a value of [[Encoder.Toast]] emits 'u', null emits
    * 'n', otherwise 'b' + datum.
    */
  object Encoder {
    /** Sentinel for "unchanged TOAST" in an encode tuple. */
    val Toast: Array[Byte] = new Array[Byte](0)

    def begin(finalLsn: Long, commitTimeUs: Long, xid: Int): Array[Byte] =
      new BytesWriter().byte('B').int64(finalLsn).int64(commitTimeUs)
        .int32(xid).result()

    def commit(commitLsn: Long, endLsn: Long, commitTimeUs: Long): Array[Byte] =
      new BytesWriter().byte('C').byte(0).int64(commitLsn).int64(endLsn)
        .int64(commitTimeUs).result()

    def relation(rel: Relation): Array[Byte] = {
      val w = new BytesWriter().byte('R').int32(rel.relId)
        .cstring(rel.namespace).cstring(rel.name)
        .byte(rel.replicaIdentity.toByte).int16(rel.columns.length)
      rel.columns.foreach { c =>
        w.byte(if (c.isKey) 1 else 0).cstring(c.name).int32(c.oid).int32(-1)
      }
      w.result()
    }

    private def tuple(w: BytesWriter, rel: Relation,
        datums: Seq[Array[Byte]]): Unit = {
      w.int16(rel.columns.length)
      datums.foreach {
        case null => w.byte('n')
        case d if d eq Toast => w.byte('u')
        case d => w.byte('b').int32(d.length).raw(d)
      }
    }

    def insert(rel: Relation, datums: Seq[Array[Byte]]): Array[Byte] = {
      val w = new BytesWriter().byte('I').int32(rel.relId).byte('N')
      tuple(w, rel, datums); w.result()
    }

    /** A Truncate ('T') message — Int32 nrels, Int8 option bits
      * (1 = CASCADE, 2 = RESTART IDENTITY), then the relids (public
      * "Logical Replication Message Formats"). The decoder promotes it
      * to [[Truncate]] (r14 ask #1 — the reference skips the frame,
      * pkg/decode/pgoutput.go:147-151, leaving replicas stale); the
      * source emits one op=TRUNCATE control row per relation and the
      * applier clears the table in-tx. */
    def truncate(relIds: Seq[Int], optionBits: Int = 0): Array[Byte] = {
      val w = new BytesWriter().byte('T').int32(relIds.length)
        .byte(optionBits.toByte)
      relIds.foreach(w.int32)
      w.result()
    }

    /** A logical-decoding message ('M', PG14+) — the
      * `pg_logical_emit_message` frame [[LogicalMessage]] decodes. */
    def message(transactional: Boolean, msgLsn: Long, prefix: String,
        content: Array[Byte]): Array[Byte] =
      new BytesWriter().byte('M')
        .byte(if (transactional) 1 else 0).int64(msgLsn)
        .cstring(prefix).int32(content.length).raw(content).result()

    /** An Origin ('O') message — Int64 origin commit LSN + origin
      * name. Decodes to [[Unknown]]('O') (skip, like the reference). */
    def origin(originLsn: Long, name: String): Array[Byte] =
      new BytesWriter().byte('O').int64(originLsn).cstring(name).result()

    def update(rel: Relation, oldDatums: Option[Seq[Array[Byte]]],
        newDatums: Seq[Array[Byte]], oldKind: Char = 'K'): Array[Byte] = {
      val w = new BytesWriter().byte('U').int32(rel.relId)
      oldDatums.foreach { od => w.byte(oldKind.toByte); tuple(w, rel, od) }
      w.byte('N'); tuple(w, rel, newDatums); w.result()
    }

    def delete(rel: Relation, oldDatums: Seq[Array[Byte]],
        oldKind: Char = 'K'): Array[Byte] = {
      val w = new BytesWriter().byte('D').int32(rel.relId).byte(oldKind.toByte)
      tuple(w, rel, oldDatums); w.result()
    }
  }
}
