package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Polynomial rolling-hash document fingerprint over UTF-8 bytes:
  * h = Σ b_i · B^(n-1-i) mod M with B=257, M=2^61−1 (Mersenne).
  *
  * Deterministic, content-defined, order-sensitive — the document
  * fingerprinting primitive for the training-data pipeline (exact-dup
  * detection across shards without shipping the text). Codegen'd so the
  * scan stays in whole-stage codegen at 100 TB.
  */
case class RollingHash(child: Expression)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"rolling_hash expects string, got ${child.dataType.simpleString}")
  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_hash"

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    RollingHash.hashBytes(bytes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.RollingHash.hashBytes($c.getBytes())")

  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)
}

object RollingHash {
  final val Base = 257L
  final val Mod = (1L << 61) - 1 // Mersenne prime 2^61-1

  /** mulmod via 128-bit-free Mersenne reduction using Math.multiplyHigh. */
  private def mulMod(a: Long, b: Long): Long = {
    val hi = Math.multiplyHigh(a, b)
    val lo = a * b
    // x = hi·2^64 + lo with a,b < 2^61 so hi < 2^58. Since 2^64 ≡ 8 and
    // 2^61 ≡ 1 (mod 2^61−1): x ≡ (hi<<3) + (lo>>>61) + (lo & M).
    var r = (lo & Mod) + (lo >>> 61) + (hi << 3)
    while (r >= Mod) r -= Mod
    r
  }

  def hashBytes(bytes: Array[Byte]): Long = {
    var h = 0L
    var i = 0
    while (i < bytes.length) {
      h = mulMod(h, Base) + (bytes(i) & 0xffL)
      if (h >= Mod) h -= Mod
      i += 1
    }
    h
  }
}
