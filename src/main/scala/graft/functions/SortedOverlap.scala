package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}

/** Native Catalyst expression: `sorted_overlap(a, b)` — the
  * intersection cardinality of two SORTED, duplicate-free
  * `array<string>` columns via a single O(|a|+|b|) merge pass.
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
  */
case class SortedOverlap(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(StringType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"sorted_overlap expects two array<string> args, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "sorted_overlap"

  override def nullSafeEval(a: Any, b: Any): Any =
    SortedOverlap.count(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val cls = SortedOverlap.getClass.getName.stripSuffix("$")
      s"${ev.value} = $cls.count($x, $y);"
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
}
