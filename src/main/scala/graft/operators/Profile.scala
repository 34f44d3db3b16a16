package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One-scan column profiling — the data-quality gate a lake runs at
  * ingest (null spikes, cardinality drift, range drift page the owner
  * before a bad batch lands in training data).
  *
  * Shape: ONE aggregate over the table computes every column's stats
  * in a single pass (Spark plans the multi-column count-distincts
  * through one shared Expand), producing a single wide row; a `stack`
  * unpivot then reshapes it to one row per column. Nothing here
  * depends on table size beyond the scan — the aggregate output is
  * O(columns), so profiling rides ingest for free at any scale.
  *
  * Sums are computed in DECIMAL so the result is order-independent
  * (a double sum's value depends on partition reduction order — it
  * would flap run to run AND disagree with any other engine).
  */
object Profile {

  /** Per-column rows `(col_name, n_null, n_distinct, vmin, vmax,
    * vsum)` for numeric `cols` of `df`, in one scan. */
  def numeric(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val aggs = cols.flatMap { c =>
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__nnull"),
        countDistinct(col(c)).as(s"${c}__ndist"),
        min(col(c).cast("double")).as(s"${c}__min"),
        max(col(c).cast("double")).as(s"${c}__max"),
        sum(col(c).cast("decimal(28,4)")).as(s"${c}__sum"))
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val stacked = cols.map(c =>
      s"'$c', ${c}__nnull, ${c}__ndist, ${c}__min, ${c}__max, " +
        s"cast(${c}__sum as double)").mkString(", ")
    wide.selectExpr(s"stack(${cols.size}, $stacked) as " +
      "(col_name, n_null, n_distinct, vmin, vmax, vsum)")
  }
}
