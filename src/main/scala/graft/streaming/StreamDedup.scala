package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming exact dedup for document/change ingest — the streaming
  * face of the q30 batch dedup (training-data pipelines dedupe on the
  * way in, not after landing).
  *
  * Spark-first: `dropDuplicatesWithinWatermark` IS the operator — one
  * state row per key, evicted once the event-time watermark passes its
  * arrival, so state is bounded by (key arrival rate × watermark
  * horizon) rather than stream lifetime. No custom
  * `flatMapGroupsWithState` is needed for plain seen-before semantics;
  * the engine's state store, RocksDB spill and checkpoint recovery all
  * come for free. For per-key LATEST-wins compaction (a different
  * contract: emit the newest, not the first) see [[Debounce]].
  *
  * Semantics: duplicates arriving within the watermark horizon of the
  * first sighting are dropped — including ACROSS micro-batches; a
  * duplicate arriving later than the horizon is re-admitted (its state
  * was evicted). Exactness over an unbounded horizon requires either an
  * unbounded store (`dropDuplicates`, viable when keys are few) or the
  * batch q30 pass downstream.
  *
  * State-store sizing: wrap the query START in
  * [[StreamRun.withStatePartitions]] when the expected state is much
  * smaller than the session's batch shuffle width (see that object's
  * scaladoc for why this cannot be a parameter here).
  */
object StreamDedup {

  /** Drop events whose `keyCols` combination was already seen within
    * the watermark horizon. `tsCol` is the event-time column. */
  def exactDedup(events: DataFrame, tsCol: String, horizon: String,
      keyCols: Seq[String]): DataFrame =
    events
      .withWatermark(tsCol, horizon)
      .dropDuplicatesWithinWatermark(keyCols)

  /** Content dedup: key = md5 of `textCol` (the q30 hash), so identical
    * document bodies dedupe regardless of id. Keeps the first sighting. */
  def byContent(docs: DataFrame, tsCol: String, horizon: String,
      textCol: String = "text"): DataFrame = {
    val keyed = docs.withColumn("__content_key",
      md5(col(textCol).cast("binary")))
    exactDedup(keyed, tsCol, horizon, Seq("__content_key"))
      .drop("__content_key")
  }
}
