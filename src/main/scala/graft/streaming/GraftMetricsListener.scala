package graft.streaming

import org.apache.spark.sql.Row
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Metrics plane (A38, reference pkg/sink/postgres.go:662-675 and the
  * agent's prometheus export, cmd/agent.go:76-142), Spark-first: the
  * pipeline `observe()`s per-batch aggregates on the streaming
  * DataFrame (changes applied, max lsn, latest commit_ts), Spark ships
  * them in every `StreamingQueryProgress`, and this listener folds them
  * into the [[ReplicationLag]] gauge and counters. No side-channel
  * metric collection inside the apply loop — the numbers ride the
  * engine's own progress events, visible in
  * `query.lastProgress.observedMetrics` and any listener sink.
  */
final class GraftMetricsListener(val replicationLag: ReplicationLag = new ReplicationLag)
    extends StreamingQueryListener {

  /** Total changes observed across batches (reference pulsar2pg's
    * applied-changes counter). */
  @volatile var changesApplied: Long = 0L
  /** Highest lsn seen (the standby-feedback position analog). */
  @volatile var lastLsn: Long = 0L
  /** Progress events carrying graft metrics (test observability). */
  @volatile var batchesObserved: Long = 0L

  /** op=TRUNCATE control rows DELIVERED by the scan (first-class since
    * r15 — the decoder promotes pgoutput 'T'; one row per affected
    * relation, batch-window-scoped). Reads the JVM-level mirror; the
    * cluster-wide aggregate is the scan node's `truncate_frames` DSv2
    * custom metric. */
  def truncateEventsDelivered: Long =
    graft.sources.WalFiles.truncateFrames.get()
  /** Table clears that actually LANDED on a target store (r14 ask #1:
    * the gauge counts applied truncates — delivered rows suppressed by
    * the applier's DDL skip-set are not in this figure). */
  def truncatesApplied: Long =
    CdcApplier.truncatesApplied.get()
  /** Unknown-tagged frames skipped ('O'rigin, 'Y', 'M', PG14 streaming
    * tags): counted, never silent (r13 ask #4), window-scoped so
    * replayed frames never recount (ADVICE r14). */
  def unknownFramesSkipped: Long =
    graft.sources.WalFiles.unknownFrames.get()

  override def onQueryStarted(
      event: StreamingQueryListener.QueryStartedEvent): Unit = ()

  override def onQueryProgress(
      event: StreamingQueryListener.QueryProgressEvent): Unit = {
    val m = event.progress.observedMetrics.get(GraftMetricsListener.MetricName)
    if (m != null) fold(m)
  }

  private def fold(m: Row): Unit = synchronized {
    batchesObserved += 1
    if (!m.isNullAt(0)) changesApplied += m.getLong(0)
    if (!m.isNullAt(1)) {
      val lsn = m.getLong(1)
      if (java.lang.Long.compareUnsigned(lsn, lastLsn) > 0) lastLsn = lsn
    }
    if (!m.isNullAt(2))
      replicationLag.record(m.getTimestamp(2).getTime)
  }

  override def onQueryTerminated(
      event: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
}

object GraftMetricsListener {
  /** The observation name [[CdcPipeline.start]] attaches. */
  final val MetricName = "graft_cdc"
}
