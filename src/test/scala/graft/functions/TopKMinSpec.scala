package graft.functions

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** top_k_min: bounded-heap per-group top-N — equals the sort-based
  * answer through real partial/merge passes (multi-partition input). */
class TopKMinSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  test("per-group k smallest == sort-based ground truth, across partitions") {
    import spark.implicits._
    GraftFunctions.register(spark)
    // deterministic pseudo-random values, 40 partitions so every
    // group's heap goes through serialize → merge
    val df = (1 to 5000).map { i =>
      (s"g${i % 7}", (i * 2654435761L) % 10007, i.toLong)
    }.toDF("g", "v", "id").repartition(40)
    val got = df.groupBy("g")
      .agg(expr("top_k_min(struct(v, id), 5)").as("top"))
      .select(col("g"), expr("transform(top, s -> s.id)").as("ids"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    val exp = (1 to 5000).map { i =>
      (s"g${i % 7}", (i * 2654435761L) % 10007, i.toLong)
    }.groupBy(_._1).map { case (g, rows) =>
      g -> rows.sortBy(r => (r._2, r._3)).take(5).map(_._3).toSeq
    }
    assert(got == exp)
  }

  test("k larger than the group returns the whole group, ascending") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val got = Seq(3L, 1L, 2L).toDF("v").repartition(3)
      .agg(expr("top_k_min(v, 10)").as("t"))
      .collect()(0).getSeq[Long](0)
    assert(got == Seq(1L, 2L, 3L))
  }

  test("string sort keys survive partial/merge") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val df = (1 to 500).map(i => (s"g${i % 3}", f"s${(i * 7919) % 1000}%04d", i.toLong))
      .toDF("g", "s", "id").repartition(20)
    val got = df.groupBy("g")
      .agg(expr("top_k_min(struct(s, id), 4)").as("top"))
      .select(col("g"), expr("transform(top, x -> x.id)").as("ids"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    val exp = (1 to 500).map(i => (s"g${i % 3}", f"s${(i * 7919) % 1000}%04d", i.toLong))
      .groupBy(_._1).map { case (g, rows) =>
        g -> rows.sortBy(r => (r._2, r._3)).take(4).map(_._3).toSeq }
    assert(got == exp)
  }

  test("null inputs are skipped") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val got = Seq(Some(3L), None, Some(1L)).toDF("v")
      .agg(expr("top_k_min(v, 2)").as("t"))
      .collect()(0).getSeq[Long](0)
    assert(got == Seq(1L, 3L))
  }
}
