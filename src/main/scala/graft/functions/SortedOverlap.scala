package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}

/** Native Catalyst expression: `sorted_overlap(a, b)` — the
  * intersection cardinality of two SORTED, duplicate-free
  * `array<string>` (or `array<bigint>`) columns via a single
  * O(|a|+|b|) merge pass.
  *
  * This is the set-similarity verify kernel: exact Jaccard over gram
  * sets is `c / (|a| + |b| − c)` with `c = sorted_overlap(a, b)`.
  * Replaces the `size(array_intersect)` / `size(array_union)`
  * formulation, which builds two hash sets per candidate pair — on a
  * prefix-filter join that verifies ~10⁶ candidates per partition the
  * hash-set churn dominated the whole query (q79: the verify stage
  * alone ran as long as candidate generation).
  *
  * Inputs MUST be sorted ascending in UTF8String binary order (Spark's
  * `array_sort` on strings) and distinct (`array_distinct` upstream);
  * the merge compares with the same `UTF8String.compareTo` that
  * `array_sort` uses, so sortedness is consistent by construction.
  *
  * The `array<bigint>` form exists for the shuffle-bytes path: hashing
  * grams to 64-bit (`xxhash64`) before the verify join ships ~8 bytes
  * per gram instead of a full shingle string, and the merge compares
  * longs instead of UTF8 bytes. Distinct grams stay distinct w.h.p.
  * (collision odds ~2⁻⁶⁴·C(n,2) — negligible against any corpus-level
  * gram vocabulary), so the count is the exact intersection size.
  */
case class SortedOverlap(left: Expression, right: Expression)
    extends BinaryExpression {

  private def elemType(e: Expression): Option[DataType] = e.dataType match {
    case ArrayType(t @ (StringType | LongType), _) => Some(t)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (elemType(left), elemType(right)) match {
      case (Some(a), Some(b)) if a == b => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"sorted_overlap expects two array<string> or two array<bigint> args, got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
    }

  private def isLong: Boolean =
    left.dataType.asInstanceOf[ArrayType].elementType == LongType
  override def dataType: DataType = IntegerType
  override def prettyName: String = "sorted_overlap"

  override def nullSafeEval(a: Any, b: Any): Any =
    if (isLong)
      SortedOverlap.countLong(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    else
      SortedOverlap.count(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val cls = SortedOverlap.getClass.getName.stripSuffix("$")
      val m = if (isLong) "countLong" else "count"
      s"${ev.value} = $cls.$m($x, $y);"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedOverlap =
    copy(left = newLeft, right = newRight)
}

object SortedOverlap {
  /** Merge-count of equal elements (public and Java-callable for the
    * generated code). Null elements terminate the merge: `array_sort`
    * places nulls LAST, and a null never counts as an intersection
    * member — so the non-null prefixes are the whole set. */
  def count(a: ArrayData, b: ArrayData): Int = {
    val n = a.numElements()
    val m = b.numElements()
    var i = 0; var j = 0; var c = 0
    while (i < n && j < m && !a.isNullAt(i) && !b.isNullAt(j)) {
      val cmp = a.getUTF8String(i).compareTo(b.getUTF8String(j))
      if (cmp == 0) { c += 1; i += 1; j += 1 }
      else if (cmp < 0) i += 1
      else j += 1
    }
    c
  }

  /** Long-element merge-count; same contract as [[count]] (sorted
    * ascending, distinct, nulls last). */
  def countLong(a: ArrayData, b: ArrayData): Int = {
    val n = a.numElements()
    val m = b.numElements()
    var i = 0; var j = 0; var c = 0
    while (i < n && j < m && !a.isNullAt(i) && !b.isNullAt(j)) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    c
  }
}
