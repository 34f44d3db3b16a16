package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Key + time-interval containment join as a first-class operator
  * (exercised end-to-end by q66 against a plain inequality join in
  * DuckDB).
  *
  * The naive plan for `p.key = i.key AND p.t >= i.start AND p.t <
  * i.end` is an equi-join on key followed by a per-key cross of every
  * point with every interval — quadratic in hot keys, and with no key
  * at all it degenerates to BroadcastNestedLoop. Spark-first shape:
  * band time into fixed buckets, explode each interval onto the
  * buckets it overlaps, send each point to the ONE bucket containing
  * it, equi-join on (key, bucket), then verify the exact predicate.
  *
  * Each (point, interval) pair can only meet in the point's single
  * bucket, so the join emits no duplicates by construction. Fan-out is
  * bounded by interval length / bucket width (+1): pick `bucketMicros`
  * near the typical interval length for ≤ 2 rows per interval. All
  * shuffles are hash-partitioned on (key, bucket) — skewed keys
  * spread across their time range, and AQE skew-join handles the rest.
  */
object IntervalJoin {

  /** Match each row of `points` (at instant `timeCol`) to every row of
    * `intervals` with the same `keyCol` whose `[startCol, endCol)`
    * half-open interval contains it. Both inputs keep all their
    * columns; names must not collide except `keyCol`. Timestamps must
    * be at or after the epoch (bucket ids come from `div`, which
    * truncates toward zero). */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
      keyCol: String, timeCol: String, startCol: String, endCol: String,
      bucketMicros: Long): DataFrame = {
    require(bucketMicros > 0, "bucketMicros must be positive")
    val b = "__ij_bucket"
    // NTZ-tolerant epoch micros (cast rides the UTC session timezone —
    // consistent as long as both sides carry the same timestamp type)
    def us(c: String) = s"unix_micros(cast($c as timestamp))"
    val pts = points.withColumn(b,
      expr(s"${us(timeCol)} div $bucketMicros"))
    // an empty interval (end <= start) covers no bucket: sequence()
    // would run backwards, so filter them out first
    val ivs = intervals.filter(col(endCol) > col(startCol)).withColumn(b,
      explode(expr(s"sequence(${us(startCol)} div $bucketMicros," +
        s" (${us(endCol)} - 1) div $bucketMicros)")))
    pts.join(ivs, Seq(keyCol, b))
      .filter(col(timeCol) >= col(startCol) && col(timeCol) < col(endCol))
      .drop(b)
  }
}
