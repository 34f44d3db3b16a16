package graft.sources

/** Live-capture loop: tail a real PostgreSQL's logical replication
  * into the WalFiles segment layout the Spark source reads — the
  * operational half of the A1 seam (reference pkg/source/postgres.go's
  * fetch loop + pkg/sink semantics). Composition, not translation:
  *
  *   PgWire START_REPLICATION → [[SegmentSink]] (tx-atomic buffering,
  *   segment flush, ack watermark) → WalFiles dir → the UNCHANGED
  *   `spark.readStream.format("pgcapture")` / batch source.
  *
  * Delivery contract matches the repo's resume discipline exactly:
  * segments are flushed on COMMIT boundaries only (a transaction
  * never splits across a flush), the standby ack reports the last
  * FLUSHED commit — so after a crash the slot re-delivers from the
  * last durable segment and the downstream consistency gate
  * (cdc.CdcApply idempotent-resume filter) drops the replayed prefix,
  * the same at-least-once-plus-gate story WalFiles replay already
  * proves in CdcSourceSpec/CheckpointSpec.
  *
  * [[SegmentSink]] is wire-free and unit-tested in-sandbox
  * (PgLiveSpec); the PgWire leg runs under PGCAPTURE_TEST_DSN.
  */
object LiveCapture {

  /** Buffers XLogData payloads, flushing a WalFiles segment every
    * `flushTxs` committed transactions. Tx-atomic by construction:
    * frames accumulate in `pending` until their Commit arrives, then
    * move to the segment buffer — a flush can only ever land on a
    * commit boundary. `ackLsn` is the end-LSN of the last FLUSHED
    * commit (0 until the first flush): the standby-status watermark
    * that lets the server truncate WAL exactly as far as disk is
    * durable, the live twin of WalFiles.writeAck/truncateAcked. */
  final class SegmentSink(dir: String, flushTxs: Int) {
    require(flushTxs > 0, "flushTxs must be positive")
    private var pending = Vector.empty[Array[Byte]] // open tx frames
    private var buf = Vector.empty[Array[Byte]]     // committed frames
    private var bufTxs = 0
    private var bufFirstLsn = -1L
    private var curTxLsn = -1L
    private var lastFlushedEnd = 0L
    private var flushed = 0L

    def ackLsn(): Long = lastFlushedEnd

    def segmentsFlushed: Long = flushed

    /** Offer one XLogData frame (pgoutput message bytes + its WAL
      * end). Relation/Type frames outside any tx attach to the NEXT
      * transaction (pgoutput sends them lazily before first use). */
    def offer(payload: Array[Byte], walEnd: Long): Unit = {
      if (payload.isEmpty) return
      payload(0).toChar match {
        case 'B' =>
          // Begin carries the tx's final LSN at bytes 1..8 — the
          // segment name key, same field WalFiles.replay tracks
          curTxLsn = new graft.codec.BytesReader(payload.drop(1)).int64()
          pending :+= payload
        case 'C' =>
          pending :+= payload
          if (bufFirstLsn < 0) bufFirstLsn = curTxLsn
          buf ++= pending
          pending = Vector.empty
          bufTxs += 1
          lastPendingEnd = walEnd
          if (bufTxs >= flushTxs) flush()
        case _ =>
          pending :+= payload
      }
    }

    private var lastPendingEnd = 0L

    /** Flush buffered COMMITTED transactions as one segment. Open
      * (uncommitted) frames stay pending — tx atomicity. No-op when
      * nothing is committed. */
    def flush(): Unit = if (buf.nonEmpty) {
      // NO WalFiles.writeAck here: the ack file is the downstream
      // CONSUMER's watermark (truncateAcked prunes what Spark has
      // consumed); the producer's durability watermark is the
      // standby-status ackLsn() to the server only.
      // overwrite = true: after a crash the slot re-delivers from its
      // last PROCESSED ack, which can sit behind segments already on
      // disk (flushed-but-unacked window, incl. the exit tail flush —
      // it lands after the in-stream final status). The re-buffered
      // transactions are the same WAL bytes grouped by the same
      // flushTxs from the same commit boundary, so a colliding
      // segment name re-writes identical bytes or a superset tail
      // segment extending a partial one. The STRICT-PREFIX case is
      // reachable too (ADVICE r14 medium): a resumed run stopped
      // earlier (smaller maxTxs, deadline mid-tail) would rewrite
      // FEWER txs under the same first-LSN name, shrinking durable
      // data a downstream reader may have consumed — so keep
      // whichever side carries the higher max commit end-LSN and skip
      // the write when the existing segment already covers the
      // candidate. Resuming with a DIFFERENT flushTxs still voids the
      // identical-bytes property and is the caller's contract (see
      // runRetrying).
      val target = java.nio.file.Paths.get(dir,
        WalFiles.segmentName(math.max(bufFirstLsn, 0L)))
      val covered = java.nio.file.Files.exists(target) && {
        val existingEnd = LiveCapture.maxCommitEnd(WalFiles.readFrames(target))
        java.lang.Long.compareUnsigned(existingEnd,
          LiveCapture.maxCommitEnd(buf.iterator)) > 0
      }
      if (!covered)
        WalFiles.writeSegment(dir, math.max(bufFirstLsn, 0L), buf,
          overwrite = true)
      // either way the buffered txs are durable (written now, or a
      // prefix of the longer existing segment) — the ack may advance
      lastFlushedEnd = lastPendingEnd
      buf = Vector.empty
      bufTxs = 0
      bufFirstLsn = -1L
      flushed += 1
    }
  }

  /** Max Commit end-LSN across `frames` (unsigned order; 0 when none).
    * pgoutput Commit layout: tag, flags(1), commit_lsn(8), end_lsn(8),
    * ts(8). */
  private[sources] def maxCommitEnd(frames: Iterator[Array[Byte]]): Long = {
    var mx = 0L
    frames.foreach { f =>
      if (f.nonEmpty && f(0).toChar == 'C') {
        val r = new graft.codec.BytesReader(f)
        r.byte(); r.byte(); r.int64() // tag, flags, commit_lsn
        val end = r.int64()
        if (java.lang.Long.compareUnsigned(end, mx) > 0) mx = end
      }
    }
    mx
  }

  /** Durable tail of the local feed: the max Commit end-LSN across
    * `dir`'s segments (unsigned order), None when the dir is empty.
    * Tag-level scan of the LAST segment only — segments are named and
    * ordered by first-tx LSN, so the maximum commit lives in the last
    * file. */
  def localTailEnd(dir: String): Option[Long] =
    WalFiles.segments(dir).lastOption.map { case (_, p) =>
      maxCommitEnd(WalFiles.readFrames(p))
    }

  /** WAL-gap guard (r13 ask #2): refuse a resume whose start LSN sits
    * BEYOND the local feed's durable tail — the WAL between them was
    * acked (or the slot was advanced/recreated) without ever landing
    * in `dir`, and streaming from `start` would write a feed with a
    * silent hole. `start` at or behind the tail is the normal
    * at-least-once overlap (redelivered segments re-write identical
    * bytes; the downstream gate drops the replayed prefix). An empty
    * dir is always fine — nothing to be discontinuous WITH. */
  private def gapCheck(dir: String, slot: String, start: Long): Unit =
    localTailEnd(dir).foreach { tail =>
      require(java.lang.Long.compareUnsigned(start, tail) <= 0,
        s"WAL gap: slot '$slot' resumes at ${PgWire.formatLsn(start)} " +
          s"but the local feed's durable tail ends at " +
          s"${PgWire.formatLsn(tail)} — the WAL between them will never " +
          s"be delivered; refusing to write a discontinuous feed in $dir")
    }

  /** Tail `dsn` into `dir` until `deadlineMs` passes or `maxTxs`
    * transactions have been captured. Creates the publication
    * (server-side scoping, PgPublication diff DDL) and the slot if
    * absent, then streams. Returns the number of segments flushed. */
  def run(dsn: PgWire.Dsn, dir: String, publication: String, slot: String,
      tables: Seq[String], deadlineMs: Long = 30000,
      maxTxs: Long = Long.MaxValue, flushTxs: Int = 16): Long = {
    val ctl = new PgWire(dsn)
    try {
      PgPublication.ensure(ctl, publication, tables)
      val repl = new PgWire(dsn, replication = true)
      try {
        val start =
          try repl.createLogicalSlot(slot)
          catch {
            case e: PgWire.PgError
                if e.fields.get('C').contains("42710") => // exists:
              // resume from the slot's durable restart point — guard
              // the raced-drop (no row) and both-LSNs-NULL cases with
              // a diagnosable failure instead of NoSuchElement/NPE
              // (ADVICE r12)
              val lsnText = ctl.query(
                s"""SELECT coalesce(confirmed_flush_lsn, restart_lsn)
                   |FROM pg_replication_slots
                   |WHERE slot_name = ${PgWire.quoteLit(slot)}"""
                  .stripMargin).headOption.flatMap(_.headOption)
                .flatMap(Option(_))
              require(lsnText.nonEmpty,
                s"replication slot '$slot' exists but has no resumable " +
                  "LSN (dropped concurrently, or both confirmed_flush_lsn " +
                  "and restart_lsn are NULL)")
              PgWire.parseLsn(lsnText.get)
          }
        gapCheck(dir, slot, start)
        val sink = new SegmentSink(dir, flushTxs)
        var txs = 0L
        repl.startReplication(slot, publication, start,
          () => sink.ackLsn(), deadlineMs) { x =>
          sink.offer(x.payload, x.walEnd)
          if (x.payload.nonEmpty && x.payload(0).toChar == 'C') txs += 1
          txs < maxTxs
        }
        sink.flush() // tail segment: whatever committed before the stop
        sink.segmentsFlushed
      } finally repl.close()
    } finally ctl.close()
  }

  /** [[run]] wrapped in the reference's retry loop (the behavior of
    * pkg/source/main.go:85-107): a TRANSIENT failure — the server
    * dropping the socket mid-COPY-BOTH (EOF / connection reset), an
    * ErrorResponse mid-replication-stream (PgError) — closes both
    * connections, waits `backoffMs`, and re-enters [[run]], which
    * resumes from the slot's durable restart point (the 42710
    * slot-exists path, reference pkg/source/postgres.go:51-163).
    * At-least-once holds by construction: unflushed frames were never
    * acked, so the server re-delivers them; redelivered segments
    * re-write identical bytes (SegmentSink overwrite — resume MUST
    * reuse the same `flushTxs`, which this loop does by passing its
    * own); the downstream consistency gate drops the replayed prefix.
    * Non-transient failures (the gap guard, a missing slot row — both
    * IllegalArgumentException) rethrow immediately: retrying a
    * diagnosis burns the budget to repeat it. Gives up after
    * `attempts` transient failures, rethrowing the last error.
    * `deadlineMs`/`maxTxs` bound each ATTEMPT. Returns the number of
    * durable segments THIS CALL added to `dir` (end count minus start
    * count — NOT a per-attempt flush sum: a failed attempt flushes
    * segments whose count dies with its exception; and not the dir
    * total either, which would inflate on any resume over a populated
    * dir, ADVICE r14). */
  def runRetrying(dsn: PgWire.Dsn, dir: String, publication: String,
      slot: String, tables: Seq[String], deadlineMs: Long = 30000,
      maxTxs: Long = Long.MaxValue, flushTxs: Int = 16,
      attempts: Int = 3, backoffMs: Long = 500): Long = {
    require(attempts > 0, "attempts must be positive")
    val preExisting = WalFiles.segments(dir).size.toLong
    var tried = 0
    var done = false
    while (!done) {
      tried += 1
      try {
        run(dsn, dir, publication, slot, tables, deadlineMs,
          maxTxs, flushTxs)
        done = true
      } catch {
        // the reference retries every source error (main.go:85-107);
        // here only the DIAGNOSES (gap guard, missing slot row —
        // IllegalArgumentException by contract) rethrow immediately
        case scala.util.control.NonFatal(e)
            if tried < attempts && !e.isInstanceOf[IllegalArgumentException] =>
          System.err.println(s"[live-capture] attempt $tried failed " +
            s"(${e.getClass.getSimpleName}: ${e.getMessage}) — " +
            s"retrying in ${backoffMs}ms from the slot's restart point")
          Thread.sleep(backoffMs)
      }
    }
    WalFiles.segments(dir).size.toLong - preExisting
  }

  /** CLI: `runMain graft.sources.LiveCapture <dsn> <dir> <pub> <slot>
    * <schema.table>[,<schema.table>...] [deadlineMs]` */
  def main(args: Array[String]): Unit = {
    require(args.length >= 5,
      "usage: LiveCapture <dsn> <dir> <pub> <slot> <tables> [deadlineMs]")
    val n = run(PgWire.Dsn.parse(args(0)), args(1), args(2), args(3),
      args(4).split(",").toSeq,
      if (args.length > 5) args(5).toLong else 30000L)
    println(s"[live-capture] flushed $n segment(s) to ${args(1)}")
  }
}
