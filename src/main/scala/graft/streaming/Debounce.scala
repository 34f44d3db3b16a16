package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful per-key debounce (A34) — the Spark port of the reference's
  * `DebounceHandler` (pkg/pgcapture/debounce.go:87-139):
  *
  *  - UPDATEs to the same key within the debounce interval collapse to
  *    the newest one (earlier ones are dropped — their checkpoints were
  *    already committed upstream by the offset mechanism);
  *  - INSERT / DELETE flush any pending UPDATE for the key, then pass
  *    through immediately (they change row existence and must not be
  *    delayed);
  *  - dump rows (lsn = 0, A25/A27 convention) always count as newest —
  *    the reference's ordering rule at debounce.go:120-137.
  *
  * Implemented on `flatMapGroupsWithState` with processing-time
  * timeouts: state per key is the single pending UPDATE, flushed when
  * the interval elapses. State size is O(live keys), partitioned by
  * the shuffle on the key — the 100 TB shape for keyed state (RocksDB
  * state store on a real cluster). When live keys are far fewer than
  * the session's batch shuffle width, size the state store by wrapping
  * the query START in [[StreamRun.withStatePartitions]].
  */
object Debounce {

  final case class Event(key: String, op: String, lsn: Long, seq: Int,
      payload: String)
  final case class PendingState(event: Event, firstSeenMs: Long)

  /** Is `a` at-or-newer than `b` in apply order? Dump rows (lsn=0) are
    * treated as newest (reference debounce.go:120-137). */
  private[streaming] def newerOrEqual(a: Event, b: Event): Boolean =
    if (a.lsn == 0L) true
    else if (b.lsn == 0L) false
    else {
      val c = java.lang.Long.compareUnsigned(a.lsn, b.lsn)
      c > 0 || (c == 0 && a.seq >= b.seq)
    }

  def debounceFn(intervalMs: Long)(
      key: String, events: Iterator[Event],
      state: GroupState[PendingState]): Iterator[Event] = {
    val out = Seq.newBuilder[Event]
    if (state.hasTimedOut) {
      state.getOption.foreach(p => out += p.event)
      state.remove()
    } else {
      val now = state.getCurrentProcessingTimeMs()
      events.foreach { e =>
        e.op match {
          case "UPDATE" =>
            state.getOption match {
              case Some(p) =>
                // collapse to newest; keep the original window start so a
                // steady update stream still flushes every interval
                val newest = if (newerOrEqual(e, p.event)) e else p.event
                state.update(PendingState(newest, p.firstSeenMs))
              case None =>
                state.update(PendingState(e, now))
                state.setTimeoutDuration(intervalMs)
            }
          case _ => // INSERT / DELETE flush pending, then pass through
            state.getOption.foreach { p => out += p.event }
            state.remove()
            out += e
        }
      }
      // re-arm the timeout relative to the pending window's start
      state.getOption.foreach { p =>
        val remaining = math.max(1L, p.firstSeenMs + intervalMs - now)
        state.setTimeoutDuration(remaining)
      }
    }
    out.result().iterator
  }

  /** Wire the debounce over a (streaming or batch) Dataset[Event].
    *
    * `keyOf` is the reference's overridable `DebounceKey()`
    * (pkg/pgcapture/debounce.go:87-139: models may debounce on
    * schema+table+custom instead of the replica-identity key): events
    * collapse per `keyOf(event)` group, so a caller can debounce
    * per-table, per-tenant, or on any payload-derived key. The default
    * is the envelope's replica-identity key — the dominant use. */
  def apply(ds: Dataset[Event], intervalMs: Long,
      keyOf: Event => String = _.key): Dataset[Event] = {
    implicit val ee = Encoders.product[Event]
    implicit val se = Encoders.product[PendingState]
    ds.groupByKey(keyOf)(Encoders.STRING)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.ProcessingTimeTimeout())(debounceFn(intervalMs))
  }
}
