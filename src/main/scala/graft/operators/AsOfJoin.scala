package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** AS-OF join as a first-class operator (exercised end-to-end by q57,
  * whose oracle is DuckDB's native ASOF LEFT JOIN).
  *
  * Spark-first shape — no range join, no per-row probing: tag both
  * inputs, union them, and take the last right-side values at or
  * before each left row with `last(_, ignoreNulls = true)` over a
  * (key, time)-ordered running frame. Cost at any scale: ONE shuffle
  * on the join key, one in-partition sort, constant running state per
  * key — the same plan a sort-merge join would need anyway, minus the
  * range-predicate explosion a naive `l.t >= r.t` join produces.
  *
  * Right-side time ties: rows at the same instant as a left row sort
  * BEFORE it (side 0 < side 1), so matching is inclusive (`>=`), the
  * standard as-of contract. Left rows with no right row at or before
  * them get NULLs (left-join semantics).
  *
  * Right rows that tie on BOTH (key, time) are broken by the packed
  * value struct itself (Spark defines a total order over structs of
  * orderable fields): `last()` then deterministically picks the
  * struct-wise greatest row, run to run. When a value column is not
  * orderable (a map), ties fall back to undefined order — callers
  * needing determinism there must make (keyCol, timeCol) unique on
  * the right side.
  */
object AsOfJoin {

  /** Whether Spark can sort values of this type — Catalyst's own
    * answer, so maps, calendar intervals, variants etc. are all
    * classified exactly as the window orderBy will judge them. */
  private def orderable(dt: org.apache.spark.sql.types.DataType): Boolean =
    org.apache.spark.sql.catalyst.expressions.RowOrdering.isOrderable(dt)

  /** For each row of `left`, append the `valueCols` of the latest
    * `right` row with `right.timeCol <= left.timeCol` on the same key.
    * Column names must not collide between sides except `keyCol` and
    * `timeCol` (shared join columns).
    *
    * All value columns are carried through the window inside ONE
    * struct (non-null for every right row, null for left rows): the
    * running `last(ignoreNulls)` therefore skips only the left-row
    * placeholders, never a genuine NULL inside a matched right row —
    * and all values always come from the SAME right row. */
  def lastAtOrBefore(left: DataFrame, right: DataFrame, keyCol: String,
      timeCol: String, valueCols: Seq[String]): DataFrame = {
    val leftCols = left.columns
    val side = "__asof_side"
    val pack = "__asof_values"
    val packType = org.apache.spark.sql.types.StructType(
      valueCols.map(c => right.schema(c).copy(name = c)))
    val taggedRight = right
      .select(col(keyCol), col(timeCol), lit(0).as(side),
        struct(valueCols.map(col): _*).as(pack))
      .select(col(keyCol) +: col(timeCol) +: col(side) +: col(pack) +:
        leftCols.filterNot(c => c == keyCol || c == timeCol)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val taggedLeft = left
      .select(col(keyCol) +: col(timeCol) +: lit(1).as(side) +:
        lit(null).cast(packType).as(pack) +:
        leftCols.filterNot(c => c == keyCol || c == timeCol).map(col): _*)
    // Deterministic tie-break among right rows sharing (key, time):
    // order by the packed struct too (value-based, so stable across
    // runs and partitionings — unlike monotonically_increasing_id).
    val ordering =
      if (orderable(packType)) Seq(col(timeCol), col(side), col(pack))
      else Seq(col(timeCol), col(side))
    val w = Window.partitionBy(col(keyCol)).orderBy(ordering: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    taggedRight.unionByName(taggedLeft)
      .withColumn(pack, last(col(pack), ignoreNulls = true).over(w))
      .filter(col(side) === 1)
      .select((leftCols.map(col) ++
        valueCols.map(c => col(s"$pack.$c").as(c))): _*)
  }
}
