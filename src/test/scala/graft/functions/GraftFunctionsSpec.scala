package graft.functions

import graft.SparkTestSession
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Function registration surface: the per-session register() path and
  * the cluster-wide GraftExtensions injection share ONE builder list,
  * so proving each builder constructs an evaluable expression covers
  * both (spark.sql.extensions only applies at first session
  * construction in a JVM, so the config path itself can't be driven
  * from the shared test session). */
class GraftFunctionsSpec extends AnyFunSuite {

  test("every registered builder constructs an evaluable expression") {
    val sample: Map[String, Seq[org.apache.spark.sql.catalyst.expressions.Expression]] = Map(
      "cosine_sim" -> Seq(
        Literal.create(Seq(1.0f, 0.0f), ArrayType(FloatType)),
        Literal.create(Seq(1.0f, 0.0f), ArrayType(FloatType))),
      "rolling_hash" -> Seq(Literal.create("abc", StringType)),
      "srp_band_codes" -> Seq(
        Literal.create(Seq.fill(64)(0.5f), ArrayType(FloatType))),
      "minhash_sig" -> Seq(
        Literal.create(Seq("a b c", "b c d"), ArrayType(StringType))),
      "sorted_overlap" -> Seq(
        Literal.create(Seq("a", "b", "c"), ArrayType(StringType)),
        Literal.create(Seq("b", "c", "d"), ArrayType(StringType))),
      "all_pairs" -> Seq(
        Literal.create(Seq(1L, 2L, 3L), ArrayType(LongType))),
      "top_k_min" -> Seq(
        Literal.create(7L, LongType), Literal.create(3, IntegerType)),
      "z_interleave16" -> Seq(
        Literal.create(43690L, LongType), Literal.create(21845L, LongType)),
      "pg_decode" -> Seq(
        Literal.create(graft.codec.PgType.encode(graft.codec.PgType.Int8, 7L),
          BinaryType),
        Literal.create(graft.codec.PgType.Int8, IntegerType)),
      "bloom_filter_agg" -> Seq(Literal.create(7L, LongType)),
      "might_contain" -> {
        val bf = org.apache.spark.util.sketch.BloomFilter.create(100)
        bf.putLong(7L)
        val bos = new java.io.ByteArrayOutputStream()
        bf.writeTo(bos)
        Seq(Literal.create(bos.toByteArray, BinaryType),
          Literal.create(7L, LongType))
      })
    assert(GraftFunctions.builders.map(_._1).toSet == sample.keySet,
      "builder list and test coverage must stay in sync")
    GraftFunctions.builders.foreach { case (name, b) =>
      b(sample(name)) match {
        case agg: org.apache.spark.sql.catalyst.expressions.aggregate
            .TypedImperativeAggregate[_] =>
          // aggregates evaluate through their buffer API, not eval(row)
          assert(agg.checkInputDataTypes().isSuccess, s"$name type check")
          val a = agg.asInstanceOf[org.apache.spark.sql.catalyst.expressions
            .aggregate.TypedImperativeAggregate[Any]]
          val buf = a.update(a.createAggregationBuffer(),
            org.apache.spark.sql.catalyst.InternalRow.empty)
          assert(a.eval(a.deserialize(a.serialize(buf))) != null,
            s"$name must evaluate through serialize/deserialize")
        case e =>
          assert(e.checkInputDataTypes().isSuccess, s"$name type check")
          assert(e.eval() != null, s"$name must evaluate")
      }
    }
  }

  test("sorted_overlap counts identically on string and hashed-long form") {
    val spark = SparkTestSession.spark
    GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT
        |  sorted_overlap(array('a','b','c'), array('b','c','d')) AS s,
        |  sorted_overlap(
        |    array_sort(transform(array('a','b','c'), g -> xxhash64(g))),
        |    array_sort(transform(array('b','c','d'), g -> xxhash64(g)))) AS l,
        |  sorted_overlap(array(1L, 5L, 9L), array(5L, 9L, 11L)) AS raw
        |""".stripMargin).collect()(0)
    assert(r.getInt(0) == 2 && r.getInt(1) == 2 && r.getInt(2) == 2)
  }

  test("GraftExtensions applies its injections without error") {
    new GraftExtensions().apply(new org.apache.spark.sql.SparkSessionExtensions)
  }

  test("SQL surface resolves via register()") {
    val spark = SparkTestSession.spark
    GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT cosine_sim(array(1.0F, 0.0F), array(1.0F, 0.0F)) AS c")
      .collect()(0).getDouble(0)
    assert(math.abs(r - 1.0) < 1e-9)
  }
}
