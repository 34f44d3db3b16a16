package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The persisted-sketch lake pattern for QUANTILES — [[SketchLake]]'s
  * sibling for p50/p95/p99 drift monitoring: daily partitions
  * materialize a fixed-size quantile partial per key, and any coarser
  * rollup (week, month, all-time) merges the stored partials without
  * rescanning raw rows.
  *
  * The partial is a deterministic bottom-k-by-hash sample: each row is
  * tagged `h = xxhash64(id…)` and the k smallest `(h, v)` pairs per
  * (keys…, day) survive (`top_k_min`, a bounded heap combined
  * map-side). Since `h` is a fixed function of the row, this is a
  * uniform row sample AND a semilattice — bottom-k of a union equals
  * bottom-k of the partials' union, in any merge order, bit-for-bit.
  * That determinism is the reason this is NOT a KLL/t-digest sketch:
  * those compact with randomized offsets and are merge-order-
  * sensitive, so a persisted rollup could not be pinned byte-stable
  * against an in-plan one (the property q102 checks). Merging also
  * drops bit-identical partial rows first, so at-least-once partial
  * appends (a replayed micro-batch re-writing the same deterministic
  * sample) cannot bias the rollup — the same idempotence
  * [[SketchLake]] gets from HLL union.
  *
  * Error contract: a sample quantile from a uniform sample of size s
  * has rank error ≤ ε with probability ≥ 1 − 2·exp(−2sε²) (DKW); at
  * the default k=1024, ε=0.06 holds with ≈1−10⁻³·³ per probe — and
  * because the sample is deterministic, a bound once verified on a
  * dataset holds on every re-run. Groups with ≤ k rows are sampled
  * whole: the "estimate" is the exact order statistic.
  *
  * 100 TB posture: a partial is ≤ k (hash, double) pairs regardless of
  * row count, so the partials table is O(keys × days × k) — the rollup
  * input for a year of a hot key is ~365·k pairs, a laptop-sized scan
  * answering a question whose raw form is a full-table sort.
  */
object QuantileLake {

  val DefaultK = 1024

  /** Per-(keyCols…, day) bottom-k partials over `valueCol`. `idCols`
    * must identify a row (they seed the sampling hash); `tsCol` is
    * truncated to a date — the daily-partition grain. Null values are
    * excluded (quantiles are over present values, the
    * `percentile`/`median` convention). */
  def partials(df: DataFrame, keyCols: Seq[String], tsCol: String,
      valueCol: String, idCols: Seq[String], k: Int = DefaultK): DataFrame = {
    graft.functions.GraftFunctions.register(df.sparkSession)
    df.filter(col(valueCol).isNotNull)
      .select(keyCols.map(col) :+ to_date(col(tsCol)).as("day") :+
        xxhash64(idCols.map(col): _*).as("h") :+
        col(valueCol).cast("double").as("v"): _*)
      .groupBy(keyCols.map(col) :+ col("day"): _*)
      .agg(expr(s"top_k_min(struct(h, v), $k)").as("sample"))
  }

  /** Quantile rollup to `keyCols` by merging stored partials — no
    * raw-row rescan. `partials` may be freshly built or read back from
    * parquet; the estimates are identical either way (the sample is
    * deterministic). `probes` maps output column name → quantile, e.g.
    * `Seq("p50" -> 0.5, "p95" -> 0.95)`; output also carries
    * `n_sample`, the merged sample size. */
  def rollup(partials: DataFrame, keyCols: Seq[String],
      probes: Seq[(String, Double)], k: Int = DefaultK): DataFrame = {
    require(probes.nonEmpty && probes.forall { case (_, q) => q > 0 && q <= 1 },
      "probes must be (name, q] with 0 < q <= 1")
    graft.functions.GraftFunctions.register(partials.sparkSession)
    // Replay dedup happens at PARTIAL-ROW granularity: a replayed
    // at-least-once append re-writes bit-identical rows (the sample is
    // deterministic), so whole-row dropDuplicates on the partials
    // table removes them — and distinct appends touching the same day
    // cover disjoint ids, so surviving samples never share an (h, v).
    // Deduping here instead of on the exploded pairs keeps the merge's
    // shuffle bounded: after explode, top_k_min's map-side combine
    // ships at most k pairs per key per partition, where a pair-level
    // distinct would exchange every element at full width first.
    val merged = partials.dropDuplicates()
      .select(keyCols.map(col) :+ explode(col("sample")).as("hv"): _*)
      .select(keyCols.map(col) :+ col("hv.h").as("h") :+ col("hv.v").as("v"): _*)
      .groupBy(keyCols.map(col): _*)
      .agg(expr(s"top_k_min(struct(h, v), $k)").as("sample"))
    val vals = array_sort(expr("transform(sample, x -> x.v)"))
    val s = size(col("sample")).cast("long")
    val qCols: Seq[Column] = probes.map { case (name, q) =>
      // sample quantile = order statistic at ceil(q·s), 1-based
      element_at(vals, greatest(lit(1), ceil(lit(q) * s)).cast("int"))
        .as(name)
    }
    merged.select(keyCols.map(col) ++ Seq(s.as("n_sample")) ++ qCols: _*)
  }

  /** Streaming leg, mirroring [[SketchLake.streamPartials]]: each
    * micro-batch APPENDS its bottom-k partials to `dir`; [[rollup]]
    * over the directory at any time answers running quantiles without
    * rescanning stream history.
    *
    * At-least-once safety: a replayed micro-batch re-runs with the
    * same batch id over the same rows, and the sample is a
    * deterministic function of them — the replay appends bit-identical
    * partial rows, which [[rollup]]'s whole-row dedup discards. Two
    * DIFFERENT batches landing partials for the same day merge through
    * the semilattice exactly as daily partials do (their ids are
    * disjoint, so the union sample is unbiased).
    *
    * Returns a `DataStreamWriter`; the caller sets its checkpoint and
    * calls `start()`. */
  def streamPartials(stream: DataFrame, keyCols: Seq[String], tsCol: String,
      valueCol: String, idCols: Seq[String], dir: String,
      k: Int = DefaultK)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream.foreachBatch {
      (batch: DataFrame, batchId: Long) =>
        partials(batch, keyCols, tsCol, valueCol, idCols, k)
          .withColumn("batch_id", lit(batchId))
          .write.mode("append").parquet(dir)
    }
}
