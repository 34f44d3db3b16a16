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
      // standby-status ackLsn() to the server only
      WalFiles.writeSegment(dir, math.max(bufFirstLsn, 0L), buf)
      lastFlushedEnd = lastPendingEnd
      buf = Vector.empty
      bufTxs = 0
      bufFirstLsn = -1L
      flushed += 1
    }
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
