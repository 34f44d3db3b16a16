package graft.cdc

/** PITR bootstrap: recover a restart checkpoint from PostgreSQL server
  * logs (reference ScanCheckpointFromLog, pkg/sink/postgres.go:677-700).
  *
  * After a point-in-time restore the target's `pgcapture.sources` row
  * may be empty or stale; the server log's recovery lines carry the
  * consistent-state LSN and last-transaction time. The scanned LSN
  * feeds the source's `startLsn` option (A21's PITR override) so the
  * stream resumes from the restore point instead of LSN 0.
  */
object PitrLog {

  // the reference's exact line shapes (LogLSNRegex / LogTxTimeRegex)
  private val LsnRe =
    """(?:consistent recovery state reached at|redo done at) ([0-9A-F]{1,8}/[0-9A-F]{1,8})""".r.unanchored
  private val TxTimeRe =
    """last completed transaction was at log time (.*?)\.?$""".r.unanchored

  final case class LogCheckpoint(lsnText: Option[String], txTime: Option[String]) {
    /** The scanned LSN as the engine's 64-bit form. */
    def lsn: Option[Long] = lsnText.map(parseLsn)
  }

  /** PG textual LSN `XXXXXXXX/XXXXXXXX` → 64-bit. */
  def parseLsn(s: String): Long = {
    val i = s.indexOf('/')
    require(i > 0, s"malformed LSN '$s'")
    (java.lang.Long.parseLong(s.substring(0, i), 16) << 32) |
      java.lang.Long.parseLong(s.substring(i + 1), 16)
  }

  /** Scan log lines, keeping the LAST recovery LSN and transaction
    * time seen (recovery can log several). Empty result = no recovery
    * lines, the caller falls back to the sources-table watermark. */
  def scanCheckpointFromLog(lines: Iterator[String]): LogCheckpoint = {
    var lsn: Option[String] = None
    var ts: Option[String] = None
    lines.foreach {
      case LsnRe(l) => lsn = Some(l)
      case TxTimeRe(t) => ts = Some(t)
      case _ => ()
    }
    LogCheckpoint(lsn, ts)
  }
}
