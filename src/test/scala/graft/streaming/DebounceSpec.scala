package graft.streaming

import graft.SparkTestSession
import graft.streaming.Debounce.Event
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Debounce semantics per reference pkg/pgcapture/debounce.go:87-139
  * (FIXTURES.md §4): bursts of UPDATEs collapse to the newest;
  * INSERT/DELETE flush pending then pass through; dump rows (lsn=0)
  * count as newest; ordering is unsigned (lsn, seq). */
class DebounceSpec extends AnyFunSuite {

  test("newerOrEqual ordering rules incl. dump rows") {
    def e(lsn: Long, seq: Int) = Event("k", "UPDATE", lsn, seq, "")
    assert(Debounce.newerOrEqual(e(2, 1), e(1, 9)))
    assert(!Debounce.newerOrEqual(e(1, 9), e(2, 1)))
    assert(Debounce.newerOrEqual(e(1, 2), e(1, 2)))
    // dump rows (lsn=0) are always newest (debounce.go:120-137)
    assert(Debounce.newerOrEqual(e(0, 1), e(999, 9)))
    assert(!Debounce.newerOrEqual(e(999, 9), e(0, 1)))
    // unsigned lsn: 2^63 > MaxValue
    assert(Debounce.newerOrEqual(e(Long.MinValue, 1), e(Long.MaxValue, 1)))
  }

  test("streaming debounce: collapse, flush-through, timeout flush") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val in = MemoryStream[Event]
    val q = Debounce(in.toDS(), intervalMs = 700)
      .writeStream.format("memory").queryName("deb_out")
      // explicit trigger cadence: pending processing-time timers fire on
      // the next interval batch instead of a continuous batch churn
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime("200 milliseconds"))
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("debck").toString)
      .start()
    def out(): Seq[Event] =
      spark.table("deb_out").as[Event].collect().toSeq
    // processing-time timers keep the engine triggering batches, so
    // processAllAvailable never quiesces — poll the sink instead
    def awaitOut(desc: String)(pred: Seq[Event] => Boolean): Seq[Event] = {
      val deadline = System.currentTimeMillis() + 60000
      var cur = out()
      while (!pred(cur) && System.currentTimeMillis() < deadline) {
        Thread.sleep(300); cur = out()
      }
      assert(pred(cur), s"$desc — last sink state: $cur")
      cur
    }

    // burst of UPDATEs on u1 (collapse pending) + INSERT on another key
    // (passes straight through); the pending u1 UPDATE then flushes via
    // the processing-time timer, newest (lsn=11) only
    in.addData(
      Event("u1", "UPDATE", 10, 1, "a"),
      Event("u1", "UPDATE", 11, 1, "b"),
      Event("i1", "INSERT", 12, 1, "x"))
    awaitOut("INSERT must pass through")(_.exists(_.key == "i1"))
    awaitOut("pending newest UPDATE flushes on timeout") { o =>
      o.filter(_.key == "u1").map(e => (e.op, e.lsn)) == Seq(("UPDATE", 11L))
    }
    assert(out().count(_.key == "u1") == 1, "older UPDATE (lsn=10) was collapsed")

    // INSERT after a fresh pending UPDATE flushes it first, then passes
    in.addData(Event("u1", "UPDATE", 14, 1, "d"))
    in.addData(Event("u1", "INSERT", 15, 1, "c"))
    awaitOut("flush-then-pass ordering") { o =>
      o.filter(_.key == "u1").map(e => (e.op, e.lsn)) ==
        Seq(("UPDATE", 11L), ("UPDATE", 14L), ("INSERT", 15L))
    }

    // dump row (lsn=0) overrides a live UPDATE with lsn>0 (newest-wins
    // rule for dump rows), flushed by the timer
    in.addData(Event("u2", "UPDATE", 20, 1, "l"),
      Event("u2", "UPDATE", 0, 5, "dump"))
    awaitOut("dump row wins the collapse") { o =>
      o.filter(_.key == "u2").map(e => (e.op, e.lsn, e.seq)) == Seq(("UPDATE", 0L, 5))
    }
    q.stop()
  }

  test("custom debounce key (DebounceKey override): collapse across row keys") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val in = MemoryStream[Event]
    // debounce on the payload's tenant prefix, not the replica-identity
    // key — the reference's model-supplied DebounceKey()
    // (pkg/pgcapture/debounce.go:87-139)
    val q = Debounce(in.toDS(), intervalMs = 400,
        keyOf = e => e.payload.takeWhile(_ != ':'))
      .writeStream.format("memory").queryName("deb_custom_out")
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime("200 milliseconds"))
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("debck2").toString)
      .start()
    def out(): Seq[Event] =
      spark.table("deb_custom_out").as[Event].collect().toSeq

    // distinct row keys, same custom key "t1" → one flushed survivor
    in.addData(
      Event("r1", "UPDATE", 30, 1, "t1:a"),
      Event("r2", "UPDATE", 31, 1, "t1:b"),
      Event("r3", "UPDATE", 32, 1, "t2:c"))
    val deadline = System.currentTimeMillis() + 60000
    while (out().size < 2 && System.currentTimeMillis() < deadline)
      Thread.sleep(300)
    val got = out().map(e => (e.key, e.lsn)).sortBy(_._2)
    assert(got == Seq(("r2", 31L), ("r3", 32L)),
      s"per-custom-key newest must survive (t1 collapses r1 into r2): $got")
    q.stop()
  }
}
