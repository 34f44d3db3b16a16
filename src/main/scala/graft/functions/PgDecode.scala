package graft.functions

import graft.codec.PgType
import org.apache.spark.sql.catalyst.CatalystTypeConverters
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{BinaryType, DataType}

/** Catalyst expression decoding one PostgreSQL binary datum to its
  * typed Catalyst value: `pg_decode(datum, oid)`. The result type is a
  * function of the (foldable) OID, so a typed projection of the CDC
  * envelope is a plain `select` and downstream plans are fully columnar
  * (SURVEY A32).
  *
  * CodegenFallback is deliberate: decode runs once per change at
  * stream-ingest rate, not in the analytic hot path; the typed columns
  * it produces are what whole-stage codegen consumes.
  */
case class PgDecode(child: Expression, oid: Int)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"pg_decode expects binary, got ${child.dataType.simpleString}")

  override val dataType: DataType = PgType.sparkType(oid)
  override def prettyName: String = "pg_decode"

  @transient private lazy val toCatalyst =
    CatalystTypeConverters.createToCatalystConverter(dataType)

  override def nullSafeEval(input: Any): Any =
    toCatalyst(PgType.decode(oid, input.asInstanceOf[Array[Byte]]))

  override protected def withNewChildInternal(newChild: Expression): PgDecode =
    copy(child = newChild)
}
