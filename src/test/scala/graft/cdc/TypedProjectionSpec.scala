package graft.cdc

import graft.SparkTestSession
import graft.codec.PgType
import graft.codec.PgOutput.{Column => C, Relation => R}
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** A32/A35: typed projection of the envelope and TOAST-aware JSON. */
class TypedProjectionSpec extends AnyFunSuite {

  private val rel = R(1, "public", "t", 'd', Seq(
    C("id", PgType.Int8, isKey = true), C("txt", PgType.Text, isKey = false),
    C("amt", PgType.Numeric, isKey = false), C("bs", PgType.Bytea, isKey = false)))

  private def envelope() = {
    val spark = SparkTestSession.spark
    val schema = StructType(Seq(
      StructField("op", StringType), StructField("lsn", LongType),
      StructField("seq", IntegerType),
      StructField("new", MapType(StringType, BinaryType)),
      StructField("old", MapType(StringType, BinaryType))))
    val amt = PgType.encode(PgType.Numeric, new java.math.BigDecimal("12.34"))
    val rows = Seq(
      // INSERT: all columns present
      Row("INSERT", 1L, 1, Map(
        "id" -> PgType.encode(PgType.Int8, 1L),
        "txt" -> PgType.encode(PgType.Text, "hello"),
        "amt" -> amt,
        "bs" -> PgType.encode(PgType.Bytea, Array[Byte](1, 2, 3))), null),
      // UPDATE: txt set to NULL (present-null), bs unchanged TOAST
      // (ABSENT), old image carries the previous bs
      Row("UPDATE", 2L, 1, Map(
        "id" -> PgType.encode(PgType.Int8, 1L),
        "txt" -> null.asInstanceOf[Array[Byte]],
        "amt" -> amt),
        Map("bs" -> PgType.encode(PgType.Bytea, Array[Byte](9, 9)))))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), schema)
  }

  test("project decodes typed columns; absent TOAST is null") {
    val out = TypedProjection.project(envelope(), rel)
      .orderBy("lsn").collect()
    assert(out(0).getAs[Long]("id") == 1L)
    assert(out(0).getAs[String]("txt") == "hello")
    assert(out(0).getAs[java.math.BigDecimal]("amt").compareTo(
      new java.math.BigDecimal("12.34")) == 0)
    assert(out(0).getAs[Array[Byte]]("bs").toSeq == Seq[Byte](1, 2, 3))
    assert(out(1).isNullAt(out(1).fieldIndex("txt")), "NULL column")
    assert(out(1).isNullAt(out(1).fieldIndex("bs")), "TOAST column absent → null")
    // schema is fully typed — downstream plans are columnar
    val sch = TypedProjection.project(envelope(), rel).schema
    assert(sch("amt").dataType == DecimalType(38, 18))
    assert(sch("id").dataType == LongType)
  }

  test("column names with quotes round-trip (no SQL-text interpolation)") {
    // a legal PG identifier: create table t ("wei'rd x" int, ...)
    val weird = R(2, "public", "t2", 'd', Seq(
      C("id", PgType.Int8, isKey = true),
      C("wei'rd x", PgType.Int4, isKey = false),
      C("""qu"ote""", PgType.Text, isKey = false)))
    val spark = SparkTestSession.spark
    val schema = StructType(Seq(
      StructField("op", StringType), StructField("lsn", LongType),
      StructField("seq", IntegerType),
      StructField("new", MapType(StringType, BinaryType)),
      StructField("old", MapType(StringType, BinaryType))))
    val rows = Seq(Row("INSERT", 1L, 1, Map(
      "id" -> PgType.encode(PgType.Int8, 5L),
      "wei'rd x" -> PgType.encode(PgType.Int4, 42),
      """qu"ote""" -> PgType.encode(PgType.Text, "v")), null))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
    val out = TypedProjection.project(df, weird).collect()
    assert(out(0).getAs[Int]("wei'rd x") == 42)
    assert(out(0).getAs[String]("""qu"ote""") == "v")
    val js = TypedProjection.toJson(df, weird).select("js")
      .collect()(0).getString(0)
    assert(js.contains("wei'rd x"))
  }

  test("projectFilled back-fills TOAST from the old image") {
    val out = TypedProjection.projectFilled(envelope(), rel)
      .orderBy("lsn").collect()
    assert(out(1).getAs[Array[Byte]]("bs").toSeq == Seq[Byte](9, 9),
      "unchanged TOAST filled from old (A5 backfill)")
  }

  test("toJson omits absent TOAST keys but keeps explicit nulls (A35)") {
    val out = TypedProjection.toJson(envelope(), rel)
      .orderBy("lsn").select("js").collect().map(_.getString(0))
    assert(out(0).contains("\"bs\""))
    // UPDATE row: bs ABSENT from JSON entirely; txt present as null
    assert(!out(1).contains("\"bs\""), s"absent TOAST key leaked: ${out(1)}")
    assert(out(1).contains("\"txt\":null"), s"explicit null lost: ${out(1)}")
  }
}
