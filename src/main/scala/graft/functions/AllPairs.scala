package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StructField, StructType}

/** Native Catalyst expression: `all_pairs(xs)` — every ordered pair
  * `struct(x = xs[i], y = xs[j])` with `i < j`, for ANY element type.
  *
  * This is the LSH posting-list expansion kernel shared by the
  * near-dup suites (q31/q35/q50/q69/q77/q79): a bucket's candidate
  * pairs come from in-list combinatorics rather than a bucket
  * self-join, and this expression replaces the
  * `flatten(transform(xs, (x,i) -> transform(slice(xs, i+2, n), …)))`
  * higher-order-function chain — HOF lambdas evaluate interpreted and
  * the `slice` allocates a suffix copy per element, so the old form
  * paid O(n²) allocations per bucket on top of interpreted dispatch.
  *
  * Pass a SORTED array (the bucket builders' `sort_array` aggregate)
  * so `x < y` holds element-wise and pair orientation is
  * deterministic. Output order is (i, then j), identical to the HOF
  * formulation. Callers cap bucket sizes (`MaxBucketSize`,
  * `MaxGramDf`); inputs whose Long-computed pair count exceeds 10⁷
  * (one task materializing >10⁷ pair rows is a pipeline bug, not a
  * workload) throw rather than truncate.
  */
case class AllPairs(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: ArrayType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"all_pairs expects an array, got ${other.simpleString}")
  }

  private lazy val elem = child.dataType.asInstanceOf[ArrayType]

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("x", elem.elementType, elem.containsNull),
    StructField("y", elem.elementType, elem.containsNull))),
    containsNull = false)
  override def prettyName: String = "all_pairs"

  override def nullSafeEval(input: Any): Any =
    AllPairs.expand(input.asInstanceOf[ArrayData], elem.elementType)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = AllPairs.getClass.getName.stripSuffix("$")
    val et = ctx.addReferenceObj("elemType", elem.elementType,
      classOf[DataType].getName)
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = $cls.expand($x, $et);")
  }

  override protected def withNewChildInternal(newChild: Expression): AllPairs =
    copy(child = newChild)
}

object AllPairs {
  /** One pass: copy each element once, emit n·(n−1)/2 two-field rows
    * (public and Java-callable for the generated code). */
  def expand(arr: ArrayData, et: DataType): GenericArrayData = {
    val n = arr.numElements()
    // pair count computed in Long: n*(n-1)/2 overflows Int from
    // n = 46341, well under the element-count limit
    val nPairs = n.toLong * (n - 1) / 2
    require(nPairs <= 10000000L,
      s"all_pairs input too large: $n elements -> $nPairs pairs")
    val elems = new Array[Any](n)
    var i = 0
    while (i < n) {
      // copy: the backing array may be an UnsafeArrayData whose
      // element views die with the row buffer
      elems(i) = InternalRow.copyValue(arr.get(i, et))
      i += 1
    }
    val out = new Array[Any](n * (n - 1) / 2)
    var k = 0
    i = 0
    while (i < n) {
      var j = i + 1
      while (j < n) {
        out(k) = new GenericInternalRow(Array[Any](elems(i), elems(j)))
        k += 1
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }
}
