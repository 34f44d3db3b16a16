package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The persisted-sketch lake pattern for distinct counts: daily
  * partitions materialize fixed-size HLL sketch binaries (Apache
  * DataSketches, Spark's `hll_sketch_agg` family), and every coarser
  * rollup — week, month, all-time, any key subset — is a cheap union
  * over the stored partials. The raw rows are scanned ONCE, when the
  * partials are built; incremental days append new partials without
  * touching history.
  *
  * 100 TB posture: a partial is ≤ a few KB regardless of row count, so
  * the partials table is O(keys × days) — queryable on a laptop even
  * when the fact table is not. The sketches are byte-stable through
  * parquet (SketchLakeSpec pins estimate equality before/after a
  * storage round-trip), which is what makes the pattern safe: a rollup
  * over re-read partials answers exactly what the in-plan union would.
  *
  * In-plan flavor (no storage leg) is q95; the persisted leg is q96.
  */
object SketchLake {

  /** Per-(keyCols…, day) HLL partial sketches over `valueCol`. `tsCol`
    * is truncated to a date — the standard daily-partition grain. */
  def partials(df: DataFrame, keyCols: Seq[String], tsCol: String,
      valueCol: String): DataFrame =
    df.groupBy(keyCols.map(col) :+ to_date(col(tsCol)).as("day"): _*)
      .agg(hll_sketch_agg(col(valueCol)).as("sk"))

  /** Distinct-count rollup to `keyCols` by unioning stored partials —
    * no raw-row rescan. `partials` may be freshly built or read back
    * from parquet; the estimate is identical either way. */
  def rollup(partials: DataFrame, keyCols: Seq[String]): DataFrame =
    partials.groupBy(keyCols.map(col): _*)
      .agg(hll_sketch_estimate(hll_union_agg(col("sk")))
        .as("apx_users")) // hll_sketch_estimate returns a LONG estimate

  /** Streaming leg: each micro-batch APPENDS its partial sketches to
    * `dir`; [[rollup]] over the directory at any time answers running
    * distinct counts without ever scanning the raw stream history.
    *
    * Delivery semantics make this safe with plain at-least-once
    * appends: an HLL union is IDEMPOTENT over its inputs (unioning the
    * same sketch twice is a no-op), so a micro-batch replayed after a
    * failure appends duplicate partial rows that cannot move any
    * rollup estimate — at-least-once storage yields exactly-correct
    * counts, no transactional sink required (SketchLakeSpec pins
    * this). The `batch_id` column exists for housekeeping/compaction,
    * not correctness.
    *
    * Returns a `DataStreamWriter`; the caller sets its checkpoint and
    * calls `start()`. */
  def streamPartials(stream: DataFrame, keyCols: Seq[String], tsCol: String,
      valueCol: String, dir: String)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream.foreachBatch {
      (batch: DataFrame, batchId: Long) =>
        partials(batch, keyCols, tsCol, valueCol)
          .withColumn("batch_id", lit(batchId))
          .write.mode("append").parquet(dir)
    }
}
