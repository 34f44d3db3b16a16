package graft.codec

import scala.collection.mutable

/** pglogical_output wire codec (A3; reference pkg/decode/pglogical.go:
  * 43-175) — the second logical-replication format the engine ingests.
  *
  * Differences from pgoutput: every message carries a flags byte after
  * the tag; relation messages are length-prefixed strings (uint8 for
  * names, uint16 for columns) framed by 'A'/'C'/'N' markers and carry
  * NO type OIDs or key flags — those come from the schema catalog
  * (A5/A6), supplied here as lookup functions; tuples are framed by a
  * 'T' tag; text datums are NUL-terminated on the wire.
  *
  * Produces the same [[PgOutput.Message]] envelope as the pgoutput
  * decoder, so everything downstream (source, applier, typed
  * projection) is format-agnostic.
  */
object PgLogical {

  /** Column metadata resolver: (namespace, relation, column) → OID,
    * and key-column test — the reference's PGXSchemaLoader role. */
  final case class TypeLookup(
      oid: (String, String, String) => Int = (_, _, _) => 0,
      isKey: (String, String, String) => Boolean = (_, _, _) => false)

  final class Decoder(lookup: TypeLookup = TypeLookup())
      extends PgOutput.WireDecoder {
    private val relations = mutable.Map.empty[Int, PgOutput.Relation]

    def decode(msg: Array[Byte]): PgOutput.Message = {
      val r = new BytesReader(msg)
      val tag = r.byte().toChar
      tag match {
        case 'B' =>
          r.byte() // flags
          PgOutput.Begin(r.int64(), r.int64(), r.int32())
        case 'C' =>
          r.byte() // flags
          PgOutput.Commit(r.int64(), r.int64(), r.int64())
        case 'R' =>
          r.byte() // flags
          val relId = r.int32()
          val nsp = r.string8()
          val rel = r.string8()
          expect(r, 'A')
          val natts = r.int16().toInt
          val cols = (0 until natts).map { _ =>
            expect(r, 'C')
            r.byte() // per-column flags
            expect(r, 'N')
            val name = r.string16()
            PgOutput.Column(name, lookup.oid(nsp, rel, name),
              lookup.isKey(nsp, rel, name))
          }
          val relation = PgOutput.Relation(relId, nsp, rel, 'd', cols)
          relations(relId) = relation
          PgOutput.RelationMsg(relation)
        case 'I' | 'U' | 'D' =>
          r.byte() // flags
          val relId = r.int32()
          val rel = relations.getOrElse(relId,
            throw new CodecException(s"unknown relation id $relId"))
          var kind = r.byte().toChar
          var old: Option[NamedTuple] = None
          if (kind != 'N') {
            old = Some(readTuple(r, rel))
            if (tag == 'U') kind = r.byte().toChar
          }
          val nt = if (kind == 'N') Some(readTuple(r, rel)) else None
          val op = tag match {
            case 'I' => "INSERT"; case 'U' => "UPDATE"; case _ => "DELETE"
          }
          // new image: NULLs present-with-null, unchanged TOAST absent
          // unless the old image carries the value (reference
          // makeNewPBTuple); old image: NULL columns dropped
          val newImage = nt.map { t =>
            val base = t.values ++ t.nulls.map(_ -> (null: Array[Byte]))
            old match {
              case Some(o) => base ++ t.toast.flatMap(c => o.values.get(c).map(c -> _))
              case None => base
            }
          }
          PgOutput.Change(op, rel, newImage, old.map(_.values))
        case other => PgOutput.Unknown(other)
      }
    }

    private def expect(r: BytesReader, c: Char): Unit = {
      val t = r.byte().toChar
      if (t != c) throw new CodecException(s"pglogical: expected $c, got $t")
    }

    private final case class NamedTuple(values: Map[String, Array[Byte]],
        nulls: Set[String], toast: Set[String])

    private def readTuple(r: BytesReader, rel: PgOutput.Relation): NamedTuple = {
      expect(r, 'T')
      val n = r.int16().toInt
      val values = Map.newBuilder[String, Array[Byte]]
      val nulls = Set.newBuilder[String]
      val toast = Set.newBuilder[String]
      var i = 0
      while (i < n) {
        val colName = if (i < rel.columns.length) rel.columns(i).name else null
        r.byte().toChar match {
          case 'b' =>
            val d = r.bytes(r.int32())
            if (colName != null) values += colName -> d
          case 't' =>
            var d = r.bytes(r.int32())
            // text datums carry a trailing NUL on the pglogical wire
            if (d.nonEmpty && d(d.length - 1) == 0)
              d = java.util.Arrays.copyOf(d, d.length - 1)
            if (colName != null) values += colName -> d
          case 'n' => if (colName != null) nulls += colName
          case 'u' => if (colName != null) toast += colName
          case other =>
            throw new CodecException(s"pglogical: bad tuple format '$other'")
        }
        i += 1
      }
      NamedTuple(values.result(), nulls.result(), toast.result())
    }
  }

  /** Fixture/wire encoder — inverse of [[Decoder]]. */
  object Encoder {
    val Toast: Array[Byte] = PgOutput.Encoder.Toast

    def begin(finalLsn: Long, commitTimeUs: Long, xid: Int): Array[Byte] =
      new BytesWriter().byte('B').byte(0).int64(finalLsn)
        .int64(commitTimeUs).int32(xid).result()

    def commit(commitLsn: Long, endLsn: Long, commitTimeUs: Long): Array[Byte] =
      new BytesWriter().byte('C').byte(0).int64(commitLsn).int64(endLsn)
        .int64(commitTimeUs).result()

    def relation(rel: PgOutput.Relation): Array[Byte] = {
      val w = new BytesWriter().byte('R').byte(0).int32(rel.relId)
      def s8(s: String): Unit = {
        val b = s.getBytes("UTF-8"); w.uint8(b.length); w.raw(b)
      }
      s8(rel.namespace); s8(rel.name)
      w.byte('A').int16(rel.columns.length)
      rel.columns.foreach { c =>
        w.byte('C').byte(0).byte('N')
        val b = c.name.getBytes("UTF-8")
        w.int16(b.length); w.raw(b)
      }
      w.result()
    }

    private def tuple(w: BytesWriter, datums: Seq[Array[Byte]]): Unit = {
      w.byte('T').int16(datums.length)
      datums.foreach {
        case null => w.byte('n')
        case d if d eq Toast => w.byte('u')
        case d => w.byte('b').int32(d.length).raw(d)
      }
    }

    def insert(rel: PgOutput.Relation, datums: Seq[Array[Byte]]): Array[Byte] = {
      val w = new BytesWriter().byte('I').byte(0).int32(rel.relId).byte('N')
      tuple(w, datums); w.result()
    }

    def update(rel: PgOutput.Relation, oldDatums: Option[Seq[Array[Byte]]],
        newDatums: Seq[Array[Byte]]): Array[Byte] = {
      val w = new BytesWriter().byte('U').byte(0).int32(rel.relId)
      oldDatums.foreach { od => w.byte('K'); tuple(w, od) }
      w.byte('N'); tuple(w, newDatums); w.result()
    }

    def delete(rel: PgOutput.Relation, oldDatums: Seq[Array[Byte]]): Array[Byte] = {
      val w = new BytesWriter().byte('D').byte(0).int32(rel.relId).byte('K')
      tuple(w, oldDatums); w.result()
    }
  }
}
