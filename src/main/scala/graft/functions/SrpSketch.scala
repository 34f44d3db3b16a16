package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Native Catalyst expression: SRP-LSH band codes of a float vector.
  *
  * `srp_band_codes(embedding)` returns the 16 band codes (8 bits each)
  * of the 128-plane signed-random-projection sketch in one fused loop:
  * quantize → 128 integer dot products against the md5-derived ±1
  * hyperplane matrix → band-packed sign bits. A single per-row kernel
  * replaces the higher-order-function formulation (transform +
  * zip_with + aggregate), which costs ~16k interpreted lambda calls
  * per row — at 100 TB the sketch step is pure map-side CPU, so it has
  * to live inside whole-stage codegen.
  *
  * Determinism contract (shared with the DuckDB oracle, see
  * graft.queries.VectorOps): quantization is round-half-away-from-zero
  * of x·1000 in double; dot products are integer; a zero dot counts as
  * bit set. The hyperplane matrix is [[SrpSketch.signs]], derived from
  * md5("p_j") — bytes any engine reproduces.
  */
case class SrpSketch(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"srp_band_codes expects array<float>, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "srp_band_codes"

  override def nullSafeEval(input: Any): Any = {
    val x = input.asInstanceOf[ArrayData]
    new GenericArrayData(SrpSketch.codes(x))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val cls = SrpSketch.getClass.getName.stripSuffix("$")
      s"${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"$cls.codes($x));"
    })

  override protected def withNewChildInternal(newChild: Expression): SrpSketch =
    copy(child = newChild)
}

object SrpSketch {
  final val Planes = 128
  final val Dims = 64
  final val BandBits = 8
  final val Bands = Planes / BandBits
  final val QuantScale = 1000.0

  /** ±1 hyperplane matrix: sign p,j = +1 iff the first hex digit of
    * md5("p_j") is < '8'. */
  lazy val signs: Array[Array[Int]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(Planes, Dims) { (p, j) =>
      val h = md.digest(s"${p}_${j}".getBytes("UTF-8"))
      if (((h(0) >> 4) & 0xF) < 8) 1 else -1
    }
  }

  /** The fused kernel (called from generated code — must stay public,
    * Java-callable, and allocation-light). */
  def codes(x: ArrayData): Array[Long] = {
    val n = math.min(Dims, x.numElements())
    val q = new Array[Long](Dims)
    var j = 0
    while (j < n) {
      val v = x.getFloat(j).toDouble * QuantScale
      q(j) = (if (v >= 0) math.floor(v + 0.5) else math.ceil(v - 0.5)).toLong
      j += 1
    }
    val out = new Array[Long](Bands)
    var p = 0
    while (p < Planes) {
      val row = signs(p)
      var dot = 0L
      var k = 0
      while (k < Dims) { dot += row(k) * q(k); k += 1 }
      if (dot >= 0L) out(p / BandBits) |= 1L << (p % BandBits)
      p += 1
    }
    out
  }
}
