package graft.sources

import java.nio.file.Files

import graft.cdc.Checkpoint
import graft.codec.{PgOutput, PgType}
import graft.codec.PgOutput.{Column => C, Relation => R}
import org.scalatest.funsuite.AnyFunSuite

/** The incremental-tail contract (VERDICT r3 item 1): per-trigger decode
  * cost is O(newly-appeared data), never O(total feed), and admission
  * control is answered from the in-memory tx index without re-reads. */
class WalTailSpec extends AnyFunSuite {

  private val rel = R(1, "public", "t1", 'd',
    Seq(C("id", PgType.Int8, isKey = true)))

  private def tx(lsn: Long, n: Int): Seq[Array[Byte]] =
    PgOutput.Encoder.begin(lsn, lsn * 1000, lsn.toInt) +:
      (1 to n).map(i => PgOutput.Encoder.insert(rel,
        Seq(PgType.encode(PgType.Int8, lsn * 100 + i)))) :+
      PgOutput.Encoder.commit(lsn, lsn, lsn * 1000)

  test("advance decodes each segment exactly once — O(new data) per call") {
    val dir = Files.createTempDirectory("tail").toString
    // segment 1: rel + tx of 3 changes = 1 + 5 frames
    WalFiles.writeSegment(dir, 100L,
      PgOutput.Encoder.relation(rel) +: tx(100L, 3))
    val tail = new WalTail(dir)
    assert(tail.last() == Checkpoint(100L, 3))
    val afterFirst = tail.framesDecoded
    assert(afterFirst == 6)

    // repeated polls with no new WAL decode nothing
    (1 to 5).foreach(_ => assert(tail.last() == Checkpoint(100L, 3)))
    assert(tail.framesDecoded == afterFirst)

    // a new segment costs only its own frames
    WalFiles.writeSegment(dir, 101L, tx(101L, 2)) // 4 frames
    assert(tail.last() == Checkpoint(101L, 2))
    assert(tail.framesDecoded == afterFirst + 4)

    // and again: still no re-decode of old segments
    (1 to 5).foreach(_ => tail.last())
    assert(tail.framesDecoded == afterFirst + 4)
  }

  test("fresh tail seeds relations from the sidecar catalog (post-truncation driver)") {
    val dir = Files.createTempDirectory("tailC").toString
    // the catalog holds the ONLY Relation declaration (its declaring
    // segment was truncated away); the segment carries just the tx
    val w = new graft.codec.BytesWriter()
    val rFrame = PgOutput.Encoder.relation(rel)
    w.int32(rFrame.length).raw(rFrame)
    Files.write(WalFiles.relationsPath(dir.toString).normalize, w.result())
    WalFiles.writeSegment(dir, 600L, tx(600L, 2))
    val tail = new WalTail(dir)
    assert(tail.last() == Checkpoint(600L, 2),
      "driver tail must decode rows of catalog-only relations")
  }

  test("untracked tail (no admission cap) answers bounded() with the feed end") {
    val dir = Files.createTempDirectory("tailU").toString
    WalFiles.writeSegment(dir, 500L,
      PgOutput.Encoder.relation(rel) +: (tx(500L, 2) ++ tx(501L, 1)))
    val tail = new WalTail(dir, trackTx = false)
    // no tx index → no admission control, but never a stall: the whole
    // available feed is the batch
    assert(tail.bounded(Checkpoint.Zero, 1) == Checkpoint(501L, 1))
  }

  test("out-of-order segment appearance resets the tail, offsets stay monotone") {
    val dir = Files.createTempDirectory("tailO").toString
    WalFiles.writeSegment(dir, 200L,
      PgOutput.Encoder.relation(rel) +: tx(200L, 2))
    val tail = new WalTail(dir)
    assert(tail.last() == Checkpoint(200L, 2))
    // a straggler lands BELOW the consumed high-water mark (slow
    // concurrent producer): silently decoding it after segment 200
    // would feed the decoder out of order and regress the checkpoint
    WalFiles.writeSegment(dir, 150L,
      PgOutput.Encoder.relation(rel) +: tx(150L, 1))
    assert(tail.last() == Checkpoint(200L, 2),
      "latestOffset must never go backwards (Spark monotone-offset contract)")
    assert(tail.resets == 1, "low segment must force a state reset")
    // the tx index was rebuilt in feed order: the straggler batches first
    assert(tail.bounded(Checkpoint.Zero, 1) == Checkpoint(150L, 1))
    assert(tail.bounded(Checkpoint(150L, 1), 2) == Checkpoint(200L, 2))
  }

  test("warmRelations scans each segment's bytes once per JVM (R-frame cache)") {
    val dir = Files.createTempDirectory("tailW").toString
    val p = WalFiles.writeSegment(dir, 300L,
      PgOutput.Encoder.relation(rel) +: tx(300L, 1))
    val scans0 = WalFiles.relScans.get()
    val d1 = WalFiles.decoderFor("pgoutput")
    WalFiles.warmRelations(Seq(p), d1)
    assert(WalFiles.relScans.get() == scans0 + 1)
    // a second reader over the same pruned segment replays cached frames
    val d2 = WalFiles.decoderFor("pgoutput")
    WalFiles.warmRelations(Seq(p), d2)
    assert(WalFiles.relScans.get() == scans0 + 1,
      "reader-side warmup must not re-read pruned segment bytes per batch")
    // and the cached warmup really seeded the relation state
    val decoded = d2.decode(PgOutput.Encoder.insert(rel,
      Seq(PgType.encode(PgType.Int8, 7L))))
    assert(decoded match {
      case c: PgOutput.Change => c.rel.name == "t1"
      case other => fail(s"expected Change, got $other")
    })
  }

  test("bounded places batch ends on commit boundaries from the tx index") {
    val dir = Files.createTempDirectory("tailB").toString
    // txs of sizes 1, 3, 1, 1 — the CdcSourceSpec rate-limit fixture
    WalFiles.writeSegment(dir, 400L,
      PgOutput.Encoder.relation(rel) +:
        (tx(400L, 1) ++ tx(401L, 3) ++ tx(402L, 1) ++ tx(403L, 1)))
    val tail = new WalTail(dir)
    // limit 2: tx400 (1 taken) then tx401 entered and finished (no split)
    assert(tail.bounded(Checkpoint.Zero, 2) == Checkpoint(401L, 3))
    val decoded = tail.framesDecoded
    // next batch: tx402 + tx403 — answered from the index, no re-decode
    assert(tail.bounded(Checkpoint(401L, 3), 2) == Checkpoint(403L, 1))
    assert(tail.framesDecoded == decoded)
    // mid-tx start: the remaining 2 changes of tx401 fill the cap
    val tail2 = new WalTail(dir)
    assert(tail2.bounded(Checkpoint(401L, 1), 2) == Checkpoint(401L, 3))
    // beyond the feed: returns from unchanged
    assert(tail2.bounded(Checkpoint(500L, 0), 2) == Checkpoint(500L, 0))
  }
}
