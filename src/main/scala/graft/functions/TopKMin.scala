package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.types.{ArrayType, DataType}

/** Native aggregate: `top_k_min(e, k)` — the k smallest values of `e`
  * (any orderable type; pass a struct to get lexicographic composite
  * ordering), returned as an ascending array.
  *
  * This is the scale-correct shape for per-group top-N: a bounded
  * heap per aggregation buffer, combined map-side BEFORE the shuffle —
  * each partition ships at most k values per group, and no partition
  * ever sorts or buffers a whole group. The `row_number() OVER
  * (PARTITION BY g ORDER BY …) <= k` formulation it replaces must
  * shuffle and SORT every row of every group; fine when groups are
  * small, dead when one group is a hot domain at corpus scale (q84's
  * documented fallback — this aggregate is that fallback).
  *
  * The buffer is a size-capped max-heap (k+1 binary heap of the
  * retained minima; the root is the first element evicted), serialized
  * between partial and final passes as length-prefixed UnsafeRow
  * bytes.
  */
case class TopKMin(child: Expression, kExpr: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.PriorityQueue[Any]] {

  override def children: Seq[Expression] = Seq(child, kExpr)

  override def checkInputDataTypes(): TypeCheckResult = {
    if (!kExpr.foldable) {
      TypeCheckResult.TypeCheckFailure("top_k_min: k must be a literal")
    } else if (!org.apache.spark.sql.catalyst.expressions.RowOrdering
        .isOrderable(child.dataType)) {
      TypeCheckResult.TypeCheckFailure(
        s"top_k_min: ${child.dataType.simpleString} is not orderable")
    } else TypeCheckResult.TypeCheckSuccess
  }

  private lazy val k: Int = {
    val v = kExpr.eval().asInstanceOf[Number].intValue()
    require(v > 0 && v <= 1000000, s"top_k_min: k out of range: $v")
    v
  }
  private lazy val ordering: Ordering[Any] =
    TypeUtils.getInterpretedOrdering(child.dataType)

  override def dataType: DataType = ArrayType(child.dataType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "top_k_min"

  override def createAggregationBuffer(): java.util.PriorityQueue[Any] =
    new java.util.PriorityQueue[Any](ordering.reverse) // root = current max

  private def offer(buf: java.util.PriorityQueue[Any], v: Any): Unit = {
    if (buf.size < k) buf.add(v)
    else if (ordering.lt(v, buf.peek())) { buf.poll(); buf.add(v) }
  }

  override def update(buf: java.util.PriorityQueue[Any],
      input: InternalRow): java.util.PriorityQueue[Any] = {
    val v = child.eval(input)
    // DEEP copy through an UnsafeProjection before storing: the struct
    // eval path hands back a GenericInternalRow whose string/binary
    // fields are still VIEWS into the reused input buffer, and
    // InternalRow.copyValue's shallow row copy would keep those views —
    // the stored "minimum" then mutates as later rows stream through
    // (caught by TopKMinSpec's string-key partial/merge test)
    if (v != null) offer(buf, proj(InternalRow(v)).copy().get(0, child.dataType))
    buf
  }

  override def merge(buf: java.util.PriorityQueue[Any],
      other: java.util.PriorityQueue[Any]): java.util.PriorityQueue[Any] = {
    other.forEach(v => offer(buf, v))
    buf
  }

  override def eval(buf: java.util.PriorityQueue[Any]): Any = {
    val arr = buf.toArray.sorted(ordering.asInstanceOf[Ordering[AnyRef]])
    new GenericArrayData(arr)
  }

  private lazy val proj = UnsafeProjection.create(Array(child.dataType))

  override def serialize(buf: java.util.PriorityQueue[Any]): Array[Byte] = {
    val rows = new scala.collection.mutable.ArrayBuffer[Array[Byte]](buf.size)
    buf.forEach { v =>
      // copy() before getBytes: getBytes returns the projection's
      // SHARED backing array (no copy) whenever offset/size line up,
      // so without the copy every serialized element aliases the same
      // progressively-overwritten buffer
      rows += proj(InternalRow(v)).copy().getBytes
    }
    val total = 4 + rows.map(4 + _.length).sum
    val bb = ByteBuffer.allocate(total)
    bb.putInt(rows.size)
    rows.foreach { r => bb.putInt(r.length); bb.put(r) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.PriorityQueue[Any] = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = createAggregationBuffer()
    val n = bb.getInt
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val arr = new Array[Byte](len)
      bb.get(arr)
      val row = new UnsafeRow(1)
      row.pointTo(arr, len)
      buf.add(InternalRow.copyValue(row.get(0, child.dataType)))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKMin =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKMin =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKMin =
    copy(child = newChildren(0), kExpr = newChildren(1))
}
