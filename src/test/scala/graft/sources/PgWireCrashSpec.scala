package graft.sources

import java.nio.file.Files

import scala.collection.mutable

import org.scalatest.funsuite.AnyFunSuite

import graft.codec.PgOutput
import graft.sources.MockPg._

/** Failure and resume paths of the live-capture leg (r13 ask #2) —
  * what a real WAL client lives on, driven against the scripted
  * protocol-v3 mock: the server dropping the socket mid-COPY-BOTH
  * (LiveCapture must re-enter at the durable restart point with no
  * duplicate or lost segment rows — the behavior of the reference's
  * retry loop, pkg/source/main.go:85-107, and checkpoint resume,
  * pkg/source/postgres.go:51-163), ErrorResponse mid-replication-
  * stream, a reply-demanding keepalive arriving under backlog, a
  * resume point BEYOND the local segment tail (gap detection), and
  * the mid-reply read-timeout desync close (ADVICE r13).
  */
class PgWireCrashSpec extends AnyFunSuite {

  private val rel = PgOutput.Relation(21, "public", "t_crash", 'd',
    Seq(PgOutput.Column("id", 20, isKey = true)))

  /** One tx's pgoutput frames; commit end LSN = lsn + 1. */
  private def tx(lsn: Long, xid: Int, v: String): Seq[Array[Byte]] = Seq(
    PgOutput.Encoder.begin(lsn, xid.toLong, xid),
    PgOutput.Encoder.insert(rel, Seq(v.getBytes)),
    PgOutput.Encoder.commit(lsn, lsn + 1, xid.toLong))

  /** Send a tx's frames as XLogData; the commit frame carries the
    * commit's end LSN as walEnd (what a real server reports and what
    * the sink acks), other frames the tx LSN. */
  private def sendTx(c: Conn, lsn: Long, xid: Int, v: String): Unit =
    tx(lsn, xid, v).foreach { p =>
      val end = if (p(0).toChar == 'C') lsn + 1 else lsn
      c.xlogData(lsn, end, p)
    }

  /** Catalog control-connection loop: publication exists + converged,
    * slot row answers `slotLsn`. */
  private def ctlConverged(slotLsn: String): Conn => Unit = { c =>
    c.acceptStartup(_.authOk())
    var go = true
    while (go) c.nextQuery() match {
      case None => go = false
      case Some(sql) =>
        if (sql.startsWith("SELECT 1 FROM pg_publication ")) {
          c.rowDescription("?column?"); c.dataRow(Seq("1"))
          c.commandComplete("SELECT 1"); c.readyForQuery()
        } else if (sql.contains("pg_publication_tables")) {
          c.rowDescription("qualified"); c.dataRow(Seq("public.t_crash"))
          c.commandComplete("SELECT 1"); c.readyForQuery()
        } else if (sql.contains("pg_replication_slots")) {
          c.rowDescription("lsn"); c.dataRow(Seq(slotLsn))
          c.commandComplete("SELECT 1"); c.readyForQuery()
        } else { c.commandComplete("OK"); c.readyForQuery() }
    }
  }

  /** Replication connection that resumes an existing slot at
    * `resumeAt` and then runs `body`. */
  private def replResume(resumeAt: String)(body: Conn => Unit)
      : Conn => Unit = { c =>
    c.acceptStartup(_.authOk())
    c.expectQuery() // CREATE_REPLICATION_SLOT → already exists
    c.error("42710", "replication slot \"crash_slot\" already exists")
    c.readyForQuery()
    val q = c.expectQuery()
    require(q.contains(s"LOGICAL $resumeAt"),
      s"did not resume from the durable restart point: $q")
    c.copyBothResponse()
    body(c)
  }

  test("socket drop mid-COPY-BOTH: runRetrying re-enters at the durable " +
    "restart point; no duplicate or lost segment rows") {
    // attempt 1: publication created, slot created at 0/1000, tx1
    // delivered and ACKED (flushTxs=1 → flushed at its commit), then
    // the server drops the socket with no CopyDone — the reference's
    // pkg/source/main.go retry case
    val ctl1: Conn => Unit = { c =>
      c.acceptStartup(_.authOk())
      val q1 = c.expectQuery()
      require(q1.startsWith("SELECT 1 FROM pg_publication "), q1)
      c.rowDescription("?column?"); c.commandComplete("SELECT 0")
      c.readyForQuery()
      val q2 = c.expectQuery()
      require(q2.startsWith("CREATE PUBLICATION"), q2)
      c.commandComplete("CREATE PUBLICATION"); c.readyForQuery()
      c.drain()
    }
    var ackedFlush = -1L
    val repl1: Conn => Unit = { c =>
      c.acceptStartup(_.authOk())
      c.expectQuery() // CREATE_REPLICATION_SLOT
      c.rowDescription("slot_name", "consistent_point", "snapshot_name",
        "output_plugin")
      c.dataRow(Seq("crash_slot", "0/1000", null, "pgoutput"))
      c.commandComplete("CREATE_REPLICATION_SLOT")
      c.readyForQuery()
      c.expectQuery() // START_REPLICATION
      c.copyBothResponse()
      c.xlogData(0x2000L, 0x2000L, PgOutput.Encoder.relation(rel))
      sendTx(c, 0x2000L, 1, "a")
      c.keepalive(0x2001L, wantReply = true)
      ackedFlush = c.readStandbyStatus()._2
      // handler returns → socket closes abruptly mid-COPY-BOTH
    }
    // attempt 2: slot exists; the catalog reports the acked restart
    // point; redelivery starts AFTER the flushed tx1
    val repl2 = replResume("0/2001") { c =>
      c.xlogData(0x3000L, 0x3000L, PgOutput.Encoder.relation(rel))
      sendTx(c, 0x3000L, 2, "b")
      sendTx(c, 0x4000L, 3, "c")
      c.copyDone()
      c.drain()
    }
    val dir = Files.createTempDirectory("pgcrash-resume").toString
    val srv = new Server(Seq(ctl1, repl1, ctlConverged("0/2001"), repl2))
    try {
      val segs = LiveCapture.runRetrying(srv.dsn(), dir, "crash_pub",
        "crash_slot", Seq("public.t_crash"), deadlineMs = 15000,
        flushTxs = 1, attempts = 3, backoffMs = 50)
      srv.await()
      assert(ackedFlush == 0x2001L,
        "attempt 1 must have acked tx1's commit before the drop")
      assert(segs == 3L)
      // the whole point: exactly tx1, tx2, tx3 — nothing lost to the
      // drop, nothing duplicated by the resume
      val events = WalFiles.replay(WalFiles.segments(dir).map(_._2)).toSeq
      assert(events.map(_.change.op) == Seq("INSERT", "INSERT", "INSERT"))
      assert(events.map(_.cp.lsn) == Seq(0x2000L, 0x3000L, 0x4000L))
      assert(events.map(e => new String(e.change.newTuple.get("id"))) ==
        Seq("a", "b", "c"))
      // the resume above was the gap guard's EQUALITY boundary (resume
      // 0/2001 == attempt 1's durable tail) — prove the tail read: the
      // final dir's last segment carries tx3's commit end
      assert(LiveCapture.localTailEnd(dir).contains(0x4001L))
    } finally srv.close()
  }

  test("localTailEnd: None on an empty dir, max commit end on a feed") {
    val empty = Files.createTempDirectory("pgcrash-empty").toString
    assert(LiveCapture.localTailEnd(empty).isEmpty)
  }

  test("flushed-but-unacked redelivery: overlapping segments re-write " +
    "identical bytes, replay stays exactly-once") {
    // attempt 1 flushes tx1 AND tx2 (two segments) but the server
    // never processes an ack (no reply-requested keepalive; the drop
    // wins any poll-timeout race because the scripted resume point is
    // the slot CREATION point) — resume redelivers BOTH flushed txs;
    // SegmentSink must land them as byte-identical overwrites, never
    // FileAlreadyExists, never duplicate rows
    val repl1: Conn => Unit = { c =>
      c.acceptStartup(_.authOk())
      c.expectQuery()
      c.rowDescription("slot_name", "consistent_point", "snapshot_name",
        "output_plugin")
      c.dataRow(Seq("crash_slot", "0/1000", null, "pgoutput"))
      c.commandComplete("CREATE_REPLICATION_SLOT")
      c.readyForQuery()
      c.expectQuery()
      c.copyBothResponse()
      c.xlogData(0x2000L, 0x2000L, PgOutput.Encoder.relation(rel))
      sendTx(c, 0x2000L, 1, "a")
      sendTx(c, 0x3000L, 2, "b")
      // abrupt drop, nothing acked server-side
    }
    val repl2 = replResume("0/1000") { c =>
      c.xlogData(0x1500L, 0x1500L, PgOutput.Encoder.relation(rel))
      sendTx(c, 0x2000L, 1, "a") // identical WAL bytes, redelivered
      sendTx(c, 0x3000L, 2, "b")
      sendTx(c, 0x4000L, 3, "c")
      c.copyDone()
      c.drain()
    }
    val ctl1: Conn => Unit = { c =>
      c.acceptStartup(_.authOk())
      val q1 = c.expectQuery()
      require(q1.startsWith("SELECT 1 FROM pg_publication "), q1)
      c.rowDescription("?column?"); c.commandComplete("SELECT 0")
      c.readyForQuery()
      c.expectQuery()
      c.commandComplete("CREATE PUBLICATION"); c.readyForQuery()
      c.drain()
    }
    val dir = Files.createTempDirectory("pgcrash-overlap").toString
    val srv = new Server(Seq(ctl1, repl1, ctlConverged("0/1000"), repl2))
    try {
      LiveCapture.runRetrying(srv.dsn(), dir, "crash_pub", "crash_slot",
        Seq("public.t_crash"), deadlineMs = 15000, flushTxs = 1,
        attempts = 3, backoffMs = 50)
      srv.await()
      val events = WalFiles.replay(WalFiles.segments(dir).map(_._2)).toSeq
      assert(events.map(_.cp.lsn) == Seq(0x2000L, 0x3000L, 0x4000L),
        s"redelivered overlap duplicated or lost rows: ${events.map(_.cp)}")
      assert(WalFiles.segments(dir).size == 3)
    } finally srv.close()
  }

  test("ErrorResponse mid-replication-stream surfaces as PgError with " +
    "fields; frames before it were delivered") {
    val srv = new Server(Seq({ c =>
      c.acceptStartup(_.authOk())
      c.expectQuery() // START_REPLICATION
      c.copyBothResponse()
      c.xlogData(0x8000L, 0x8000L, PgOutput.Encoder.relation(rel))
      sendTx(c, 0x8000L, 1, "x")
      c.error("57P01",
        "terminating connection due to administrator command")
      c.drain()
    }))
    try {
      val wire = new PgWire(srv.dsn(), replication = true)
      val got = mutable.Buffer.empty[Array[Byte]]
      val e = intercept[PgWire.PgError] {
        try {
          wire.startReplication("crash_slot", "crash_pub", 0x8000L,
            () => 0x8000L, deadlineMs = 15000) { x => got += x.payload; true }
        } finally wire.close()
      }
      assert(e.fields.get('C').contains("57P01"))
      assert(e.fields('M').contains("administrator command"))
      assert(got.size == 4, "frames before the error must be delivered")
      srv.await()
    } finally srv.close()
  }

  test("a reply-demanding keepalive under backlog is answered before " +
    "the stream continues (no wedge)") {
    // a genuinely full OS send buffer is not deterministically
    // reproducible in CI; the mock creates the dependency that
    // MATTERS — it refuses to send the second burst until the reply
    // arrives, so a client that postpones the reply (or wedges on its
    // own backlog) times the handler out instead of passing
    val burst1 = PgOutput.Encoder.relation(rel) +:
      (1 to 8).flatMap(i => tx(0x1000L * i, i, s"v$i"))
    val burst2 = (9 to 12).flatMap(i => tx(0x1000L * i, i, s"v$i"))
    var ack: Option[(Long, Long, Long, Byte)] = None
    val srv = new Server(Seq({ c =>
      c.acceptStartup(_.authOk())
      c.expectQuery()
      c.copyBothResponse()
      burst1.foreach(p => c.xlogData(0xA000L, 0xA000L, p))
      c.keepalive(0xA100L, wantReply = true)
      ack = Some(c.readStandbyStatus()) // blocks until the client replies
      burst2.foreach(p => c.xlogData(0xB000L, 0xB000L, p))
      c.copyDone()
      c.drain()
    }))
    try {
      val wire = new PgWire(srv.dsn(), replication = true)
      val n = try {
        wire.startReplication("ka_slot", "ka_pub", 0xA000L,
          () => 0xCAFEL, deadlineMs = 15000) { _ => true }
      } finally wire.close()
      assert(n == (burst1.size + burst2.size).toLong,
        "the stream must continue past the reply-demanding keepalive")
      srv.await()
      assert(ack.exists(_._2 == 0xCAFEL), s"ack: $ack")
    } finally srv.close()
  }

  test("gap detection: a resume point beyond the local segment tail " +
    "refuses to write a discontinuous feed") {
    val dir = Files.createTempDirectory("pgcrash-gap").toString
    // local durable tail: tx committed at 0x2000, end LSN 0x2001
    WalFiles.writeSegment(dir, 0x2000L,
      PgOutput.Encoder.relation(rel) +: tx(0x2000L, 1, "a"))
    assert(LiveCapture.localTailEnd(dir).contains(0x2001L))
    // the slot says resume at 0/9000 — the WAL in (0x2001, 0x9000)
    // was acked or the slot advanced without landing here: a hole
    val repl: Conn => Unit = { c =>
      c.acceptStartup(_.authOk())
      c.expectQuery()
      c.error("42710", "replication slot \"crash_slot\" already exists")
      c.readyForQuery()
      c.drain() // the client must bail BEFORE any START_REPLICATION
    }
    val srv = new Server(Seq(ctlConverged("0/9000"), repl))
    try {
      val e = intercept[IllegalArgumentException] {
        LiveCapture.run(srv.dsn(), dir, "crash_pub", "crash_slot",
          Seq("public.t_crash"), deadlineMs = 5000)
      }
      assert(e.getMessage.contains("WAL gap"), e.getMessage)
      assert(e.getMessage.contains("0/9000"), e.getMessage)
      assert(e.getMessage.contains("0/2001"), e.getMessage)
      srv.await()
      // and the guard is a DIAGNOSIS: runRetrying must not retry it
      val srv2 = new Server(Seq(ctlConverged("0/9000"), repl))
      try {
        val t0 = System.nanoTime()
        intercept[IllegalArgumentException] {
          LiveCapture.runRetrying(srv2.dsn(), dir, "crash_pub",
            "crash_slot", Seq("public.t_crash"), deadlineMs = 5000,
            attempts = 3, backoffMs = 2000)
        }
        assert((System.nanoTime() - t0) / 1e9 < 2.0,
          "the gap diagnosis was retried with backoff")
        srv2.await()
      } finally srv2.close()
    } finally srv.close()
  }

  test("a server silent mid-reply past the read bound desyncs → the " +
    "connection closes with a clear error (ADVICE r13)") {
    val srv = new Server(Seq({ c =>
      c.acceptStartup(_.authOk())
      c.expectQuery()
      c.rowDescription("a") // reply STARTS, then the server goes silent
      c.drain()             // wait for the client to hang up
    }))
    try {
      val wire = new PgWire(srv.dsn(), soTimeoutMs = 500)
      val e = intercept[IllegalStateException] {
        try wire.query("SELECT 1") finally wire.close()
      }
      assert(e.getMessage.contains("mid-reply"), e.getMessage)
      assert(e.getCause.isInstanceOf[java.net.SocketTimeoutException])
      srv.await()
    } finally srv.close()
  }

  test("a slow-but-healthy control query completes under a per-operation " +
    "read bound longer than the connection bound (r14 ask #6)") {
    val srv = new Server(Seq({ c =>
      c.acceptStartup(_.authOk())
      c.expectQuery()
      // the server thinks for LONGER than the connection's read bound
      // before replying — healthy, just slow (a blocking DDL, a
      // catalog read on a loaded server)
      Thread.sleep(900)
      c.rowDescription("a")
      c.dataRow(Seq("ok"))
      c.commandComplete("SELECT 1")
      c.readyForQuery()
      // second query: stay silent — the RESTORED connection bound
      // (300 ms) must fire, proving the longer bound was per-call
      c.expectQuery()
      c.drain()
    }))
    try {
      val wire = new PgWire(srv.dsn(), soTimeoutMs = 300)
      try {
        // opting into a longer bound for THIS call only
        val rows = wire.query("SELECT slow()", readBoundMs = 10000)
        assert(rows == Seq(Seq("ok")))
        val e = intercept[IllegalStateException](wire.query("SELECT 1"))
        assert(e.getMessage.contains("mid-reply"), e.getMessage)
      } finally wire.close()
      srv.await()
    } finally srv.close()
  }
}
