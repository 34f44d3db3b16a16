package graft.codec

import graft.codec.PgOutput.{Column => C, Relation => R}
import org.scalatest.funsuite.AnyFunSuite

/** pglogical wire-format round-trips (A3): flags-byte framing,
  * length-prefixed relation strings, 'T' tuple tags, NUL-trimmed text
  * datums, catalog-supplied OIDs — same Message envelope as pgoutput. */
class PgLogicalSpec extends AnyFunSuite {

  private val rel = R(5, "public", "t1", 'd', Seq(
    C("id", PgType.Int8, isKey = true), C("txt", PgType.Text, isKey = false),
    C("bs", PgType.Bytea, isKey = false)))

  private val lookup = PgLogical.TypeLookup(
    oid = (_, _, c) => Map("id" -> PgType.Int8, "txt" -> PgType.Text,
      "bs" -> PgType.Bytea)(c),
    isKey = (_, _, c) => c == "id")

  test("begin / commit / relation framing") {
    val dec = new PgLogical.Decoder(lookup)
    assert(dec.decode(PgLogical.Encoder.begin(0xAB, 123L, 7)) ==
      PgOutput.Begin(0xAB, 123L, 7))
    assert(dec.decode(PgLogical.Encoder.commit(1, 2, 3)) ==
      PgOutput.Commit(1, 2, 3))
    val rm = dec.decode(PgLogical.Encoder.relation(rel))
      .asInstanceOf[PgOutput.RelationMsg]
    assert(rm.rel.namespace == "public" && rm.rel.name == "t1")
    // OIDs and keys come from the catalog lookup, not the wire (A5/A6)
    assert(rm.rel.columns.map(_.oid) == Seq(PgType.Int8, PgType.Text, PgType.Bytea))
    assert(rm.rel.columns.filter(_.isKey).map(_.name) == Seq("id"))
  }

  test("insert / update / delete with NULL, TOAST, and text NUL-trim") {
    val dec = new PgLogical.Decoder(lookup)
    dec.decode(PgLogical.Encoder.relation(rel))

    val ins = dec.decode(PgLogical.Encoder.insert(rel, Seq(
      PgType.encode(PgType.Int8, 1L), PgType.encode(PgType.Text, "hi"),
      PgType.encode(PgType.Bytea, Array[Byte](1))))).asInstanceOf[PgOutput.Change]
    assert(ins.op == "INSERT")
    assert(PgType.decode(PgType.Text, ins.newTuple.get("txt")) == "hi")

    // UPDATE: txt NULL (present-null), bs unchanged TOAST backfilled
    // from the old image
    val upd = dec.decode(PgLogical.Encoder.update(rel,
      Some(Seq(PgType.encode(PgType.Int8, 1L), null,
        PgType.encode(PgType.Bytea, Array[Byte](7, 7)))),
      Seq(PgType.encode(PgType.Int8, 1L), null, PgLogical.Encoder.Toast)))
      .asInstanceOf[PgOutput.Change]
    val nf = upd.newTuple.get
    assert(nf.contains("txt") && nf("txt") == null)
    assert(nf.contains("bs") && nf("bs").toSeq == Seq[Byte](7, 7),
      "TOAST backfilled from the shipped old image")
    assert(upd.oldTuple.get.keySet == Set("id", "bs"), "old drops NULLs")

    val del = dec.decode(PgLogical.Encoder.delete(rel,
      Seq(PgType.encode(PgType.Int8, 9L), null, null)))
      .asInstanceOf[PgOutput.Change]
    assert(del.op == "DELETE" && del.newTuple.isEmpty)
    assert(PgType.decode(PgType.Int8, del.oldTuple.get("id")) == 9L)
  }

  test("pglogical feed streams through format(\"pgcapture\") via plugin option") {
    val walDir = java.nio.file.Files.createTempDirectory("plwal").toString
    val ckDir = java.nio.file.Files.createTempDirectory("plck").toString
    val msgs = Seq(
      PgLogical.Encoder.relation(rel),
      PgLogical.Encoder.begin(50L, 0L, 1),
      PgLogical.Encoder.insert(rel, Seq(PgType.encode(PgType.Int8, 11L),
        PgType.encode(PgType.Text, "x"), null)),
      PgLogical.Encoder.commit(50L, 50L, 0L))
    graft.sources.WalFiles.writeSegment(walDir, 50L, msgs)

    val spark = graft.SparkTestSession.spark
    val got = scala.collection.mutable.Buffer.empty[(String, String, Long)]
    val q = spark.readStream.format("pgcapture")
      .option("path", walDir).option("plugin", "pglogical").load()
      .writeStream.option("checkpointLocation", ckDir)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        got ++= b.collect().map(r =>
          (r.getString(0), r.getString(2), r.getLong(6)))
        ()
      }.start()
    q.awaitTermination(60000)
    assert(got.toSeq == Seq(("INSERT", "t1", 50L)))
  }
}
