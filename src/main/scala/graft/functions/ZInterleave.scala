package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Z-order (Morton) bit interleave of two 16-bit dimension codes:
  * `z = spread(x) | (spread(y) << 1)` where `spread` inserts a zero
  * bit between each of the 16 input bits (the classic shift-or-mask
  * ladder). The data-layout clustering primitive: sorting or radix-
  * bucketing rows by `z` bounds BOTH dimensions inside every
  * contiguous tile, which is what makes multi-column min/max file
  * skipping work (Delta/Iceberg OPTIMIZE ZORDER semantics).
  *
  * Inputs must already be scaled to [0, 65535] (rank- or min-max-
  * scaled dimension codes); out-of-range values fail loudly rather
  * than silently aliasing tiles. Codegen'd — a pure bit ladder, so
  * layout jobs stay inside whole-stage codegen at 100 TB.
  */
case class ZInterleave16(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"z_interleave16 expects (bigint, bigint), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  override def dataType: DataType = LongType
  override def prettyName: String = "z_interleave16"

  override def nullSafeEval(x: Any, y: Any): Any =
    ZInterleave16.interleave(x.asInstanceOf[Long], y.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (x, y) =>
      s"graft.functions.ZInterleave16.interleave($x, $y)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ZInterleave16 =
    copy(left = newLeft, right = newRight)
}

object ZInterleave16 {

  /** Spread the low 16 bits of `v` so bit i lands at position 2i. */
  def spread(v: Long): Long = {
    var x = v
    x = (x | (x << 8)) & 0x00FF00FFL
    x = (x | (x << 4)) & 0x0F0F0F0FL
    x = (x | (x << 2)) & 0x33333333L
    x = (x | (x << 1)) & 0x55555555L
    x
  }

  def interleave(x: Long, y: Long): Long = {
    if (x < 0 || x > 0xFFFF || y < 0 || y > 0xFFFF)
      throw new IllegalArgumentException(
        s"z_interleave16 input out of [0, 65535]: ($x, $y)")
    spread(x) | (spread(y) << 1)
  }
}
