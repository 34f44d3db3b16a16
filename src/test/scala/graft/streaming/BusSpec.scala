package graft.streaming

import java.nio.file.Files

import graft.cdc.Checkpoint
import graft.codec.PgType
import org.scalatest.funsuite.AnyFunSuite

/** Bus producer/consumer contract (A11-A14) and the lag gauge (A38). */
class BusSpec extends AnyFunSuite {

  private def ch(lsn: Long, seq: Int, id: Long) =
    CdcApplier.Change("INSERT", "public", "t",
      Map("id" -> PgType.encode(PgType.Int8, id), "n" -> null),
      Map.empty, Map("id" -> PgType.Int8), lsn, seq)

  test("serialize round-trip incl. null datum") {
    val c = ch(7, 2, 42L)
    val back = Bus.deserialize(Bus.serialize(c))
    assert(back.op == "INSERT" && back.table == "t"
      && back.lsn == 7L && back.seq == 2)
    assert(PgType.decode(PgType.Int8, back.newFields("id")) == 42L)
    assert(back.newFields.contains("n") && back.newFields("n") == null)
    assert(Bus.key(c) == Checkpoint(7, 2).serialize)
  }

  test("produce is idempotent on redelivery; tracker finds last (A12/A13)") {
    val dir = Files.createTempDirectory("bus").toString
    assert(Bus.produce(dir, Seq(ch(1, 1, 1), ch(2, 1, 2))) == 2)
    assert(Bus.last(dir).contains(Checkpoint(2, 1)))
    // full redelivery + one new message → only the new one is appended
    assert(Bus.produce(dir, Seq(ch(1, 1, 1), ch(2, 1, 2), ch(3, 1, 3))) == 1)
    assert(Bus.last(dir).contains(Checkpoint(3, 1)))
    assert(Bus.consume(dir).size == 3)
  }

  test("consumer consistency gate skips up to the checkpoint (A14)") {
    val dir = Files.createTempDirectory("bus2").toString
    Bus.produce(dir, Seq(ch(1, 1, 1), ch(2, 1, 2), ch(3, 1, 3)))
    val got = Bus.consume(dir, from = Checkpoint(2, 1))
    assert(got.map(_.lsn) == Seq(3L))
  }

  test("TRUNCATE control row rides the bus envelope and applies downstream") {
    // op is a free-form cstring in the bus wire format, so the r15
    // first-class truncate needs no format change — pin that a
    // produced control row (empty maps) round-trips and clears the
    // table through the consumer→applier leg
    val dir = Files.createTempDirectory("busT").toString
    val trunc = CdcApplier.Change("TRUNCATE", "public", "t",
      Map.empty, Map.empty, Map("id" -> PgType.Int8), 3, 1)
    val back = Bus.deserialize(Bus.serialize(trunc))
    assert(back.op == "TRUNCATE" && back.newFields.isEmpty
      && back.oldFields.isEmpty && back.lsn == 3L)
    Bus.produce(dir, Seq(ch(1, 1, 10), ch(2, 1, 20), trunc, ch(4, 1, 30)))
    val store = new InMemoryTxStore
    val keys: CdcApplier.KeyResolver = (_, _) => Seq("id")
    CdcApplier.applyBatch(store, "s", Bus.consume(dir), keys)
    assert(store.rows("public.t").map(_("id")) == Seq(30L))
    assert(store.truncations == 1)
  }

  test("bus → applier end-to-end preserves exactly-once") {
    val dir = Files.createTempDirectory("bus3").toString
    Bus.produce(dir, Seq(ch(1, 1, 10), ch(2, 1, 20)))
    val store = new InMemoryTxStore
    val keys: CdcApplier.KeyResolver = (_, _) => Seq("id")
    CdcApplier.applyBatch(store, "s", Bus.consume(dir), keys)
    // re-consume + re-apply: watermark makes it a no-op
    CdcApplier.applyBatch(store, "s", Bus.consume(dir), keys)
    assert(store.rows("public.t").map(_("id")).toSet == Set(10L, 20L))
  }

  test("producer watermark is cached: one tracker scan, O(new) per produce") {
    val dir = Files.createTempDirectory("bus4").toString
    val p = Bus.producer(dir)
    assert(p.trackerScans == 0)
    assert(p.produce(Seq(ch(1, 1, 1))) == 1)
    assert(p.produce(Seq(ch(1, 1, 1), ch(2, 1, 2))) == 1) // redelivery + 1 new
    assert(p.produce(Seq(ch(3, 1, 3))) == 1)
    assert(p.trackerScans == 1,
      "read-to-end scan must run once per producer, not per produce")
    // restart: a fresh producer re-warms from the segment exactly once
    val p2 = new BusProducer(dir)
    assert(p2.produce(Seq(ch(2, 1, 2), ch(3, 1, 3), ch(4, 1, 4))) == 1)
    assert(p2.trackerScans == 1)
    assert(Bus.last(dir).contains(Checkpoint(4, 1)))
    assert(Bus.consume(dir).map(_.lsn) == Seq(1L, 2L, 3L, 4L))
  }

  test("topic reset invalidates the cached producer watermark") {
    val dir = Files.createTempDirectory("bus5").toString
    val p = Bus.producer(dir)
    assert(p.produce(Seq(ch(5, 1, 5))) == 1)
    // out-of-band reset (retention wiped the topic)
    Files.delete(Bus.segPath(dir))
    // the cached watermark no longer describes the log: messages below
    // it must be writable again, not silently dropped
    assert(p.produce(Seq(ch(1, 1, 1))) == 1,
      "stale watermark must rewarm after a topic reset")
    assert(Bus.consume(dir).map(_.lsn) == Seq(1L))
  }

  test("serialize round-trip carries per-change replica-identity keys") {
    val c = ch(9, 1, 7L).copy(keys = Some(Seq("id", "region")))
    assert(Bus.deserialize(Bus.serialize(c)).keys.contains(Seq("id", "region")))
    // unknown (pglogical wire) stays unknown …
    assert(Bus.deserialize(Bus.serialize(ch(9, 1, 7L))).keys.isEmpty)
    // … and is distinct from "known to have no identity" (empty list)
    val c0 = ch(9, 1, 7L).copy(keys = Some(Nil))
    assert(Bus.deserialize(Bus.serialize(c0)).keys.contains(Nil))
    // wire compatibility: a message written BEFORE the keys trailer
    // existed (body ends at seq) still deserializes, as keys = None
    val legacy = Bus.serialize(ch(9, 1, 7L)).dropRight(4)
    assert(Bus.deserialize(legacy).keys.isEmpty)
    assert(Bus.deserialize(legacy).lsn == 9L)
  }

  test("out-of-band segment append invalidates the cached watermark") {
    val dir = Files.createTempDirectory("bus6").toString
    val p = Bus.producer(dir)
    assert(p.produce(Seq(ch(1, 1, 1))) == 1)
    // a second writer (single-writer contract violation, or a restored
    // backup) appends lsn 2 behind the cached producer's back
    val rogue = new BusProducer(dir)
    assert(rogue.produce(Seq(ch(2, 1, 2))) == 1)
    // the cached producer must detect the size change, rescan, and
    // neither re-append lsn 2 nor trust its stale watermark
    assert(p.produce(Seq(ch(2, 1, 2), ch(3, 1, 3))) == 1)
    assert(p.trackerScans == 2,
      "an out-of-band append must force exactly one rescan")
    assert(Bus.consume(dir).map(_.lsn) == Seq(1L, 2L, 3L))
    // teardown hygiene: eviction drops the cached producer; the next
    // produce rewarms from the segment and stays idempotent
    Bus.evictProducer(dir)
    val fresh = Bus.producer(dir)
    assert(fresh ne p)
    assert(fresh.produce(Seq(ch(3, 1, 3), ch(4, 1, 4))) == 1)
    assert(Bus.consume(dir).map(_.lsn) == Seq(1L, 2L, 3L, 4L))
  }

  test("replication lag gauge (A38)") {
    val lag = new ReplicationLag
    assert(lag.lagMillis().isEmpty, "no data yet → undefined, not zero")
    lag.record(1000L)
    assert(lag.lagMillis(nowMs = 3500L).contains(2500L))
    lag.record(900L) // older commit must not move the gauge backwards
    assert(lag.lagMillis(nowMs = 3500L).contains(2500L))
  }
}
