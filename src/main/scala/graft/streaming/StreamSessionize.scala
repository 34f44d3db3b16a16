package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming gap-based sessionization over Spark's native
  * `session_window` aggregation — the event-time twin of the batch
  * window formulation (q28). Reference behavior: pgcapture consumers
  * sessionize activity feeds downstream; here the operator is the
  * engine-native micro-batch fold.
  *
  * Semantics contract (pinned by q124's oracle = the batch SQL, and
  * by StreamSessionizeSpec on the exact boundary): an event extends
  * the current session iff `ts - prev_ts <= gapMicros`; strictly
  * greater starts a new session. Spark's `session_window` merges
  * windows that overlap OR TOUCH (`diff <= gapDuration` — measured,
  * not the half-open `<` a window-notation reading suggests), so the
  * gap duration passes through unchanged.
  *
  * Scale: state is one in-flight session row per (key, open window),
  * merged incrementally across micro-batches and EVICTED when the
  * watermark passes the session end (append mode emits exactly then) —
  * bounded by live keys, not corpus size. The state-store width is the
  * caller's to size via [[StreamRun.withStatePartitions]].
  */
object StreamSessionize {

  /** Gap-sessionize `events` on `keyCol`: emits one row per closed
    * session — (key, n_events, start_us, dur_us). Works on a streaming
    * frame (append mode; sessions emit when the watermark passes their
    * end) and on a batch frame (everything emits). */
  def sessions(events: DataFrame, keyCol: String, tsCol: String,
      gapMicros: Long, watermarkDelay: String): DataFrame = {
    val withWm =
      if (events.isStreaming) events.withWatermark(tsCol, watermarkDelay)
      else events
    withWm
      .groupBy(col(keyCol),
        session_window(col(tsCol), s"$gapMicros microseconds"))
      .agg(count(lit(1)).as("n_events"),
        min(unix_micros(col(tsCol))).as("start_us"),
        (max(unix_micros(col(tsCol))) - min(unix_micros(col(tsCol))))
          .as("dur_us"))
      .select(col(keyCol), col("n_events"), col("start_us"), col("dur_us"))
  }
}
