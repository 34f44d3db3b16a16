package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native Catalyst expression: 64-permutation MinHash signature of a
  * gram set.
  *
  * `minhash_sig(grams)` fuses, per row: md5 of each gram → 60-bit
  * truncation → 31-bit fold → running minima under the 64 affine
  * permutations h_i(x) = (a_i·x + b_i) mod P. Bit-for-bit identical to
  * the SQL formulation
  * `array_min(transform(grams, g -> (a*(conv(substring(md5(g),1,15),16,10) % 2^31)+b) % P))`
  * — the DuckDB oracle recomputes exactly that — but one tight loop
  * instead of 65 interpreted higher-order-function array passes per
  * row. Signature math is the q35 constant set
  * ([[graft.queries.Sketches.seeds]] mirrors [[MinHashSig.seeds]]).
  */
case class MinHashSig(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig expects array<string>, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(MinHashSig.sig(input.asInstanceOf[ArrayData]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val cls = MinHashSig.getClass.getName.stripSuffix("$")
      s"${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"$cls.sig($x));"
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {
  final val P = 2147483647L // 2^31 − 1
  final val NumHashes = 64

  /** LCG-derived permutation constants, fixed seed — identical to
    * graft.queries.Sketches.seeds (asserted by ScaleSketchSpec). */
  val seeds: Array[(Long, Long)] = {
    var s = 42L
    def next(): Long = {
      s = (s * 6364136223846793005L + 1442695040888963407L) & Long.MaxValue; s
    }
    Array.fill(NumHashes)(((next() % (P - 1)) + 1, next() % P))
  }
  private val seedA = seeds.map(_._1)
  private val seedB = seeds.map(_._2)

  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** The fused kernel (called from generated code — public and
    * Java-callable). Null elements are skipped — the SQL formulation
    * maps them to null hashes, which array_min ignores. Empty gram
    * arrays yield all-P sentinels, matching array_min of an empty
    * transform… which SQL would make NULL; the pipeline never feeds
    * empty gram sets (shingled() guarantees ≥ 1). */
  def sig(arr: ArrayData): Array[Long] = {
    val n = arr.numElements()
    val out = Array.fill(NumHashes)(Long.MaxValue)
    val d = md5.get()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        d.reset()
        val bytes = d.digest(arr.getUTF8String(i).getBytes)
        // first 15 hex digits = high 60 bits, then the 2^31 fold
        var v = 0L
        var k = 0
        while (k < 15) {
          val nib = if (k % 2 == 0) (bytes(k / 2) >> 4) & 0xF else bytes(k / 2) & 0xF
          v = (v << 4) | nib
          k += 1
        }
        val h = v % 2147483648L
        var s = 0
        while (s < NumHashes) {
          val cand = (seedA(s) * h + seedB(s)) % P
          if (cand < out(s)) out(s) = cand
          s += 1
        }
      }
      i += 1
    }
    out
  }
}
