package graft.queries

import graft.{SparkTestSession, Tables}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Co-located joins via bucketing (SURVEY §4 partitioning/shuffle): two
  * tables bucketed identically on the join key must join WITHOUT a
  * shuffle exchange — at 100 TB this converts the dominant repeated
  * join cost into a one-time ingest cost. */
class BucketedJoinSpec extends AnyFunSuite {

  private val dir = "/root/testdata/sf0.001"

  test("identically-bucketed tables join with no shuffle exchange") {
    val spark = SparkTestSession.spark
    val oldThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    // force a non-broadcast join so the exchange question is real
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      Tables.bucketize(Tables.load(spark, dir, "orders"),
        "orders_b", buckets = 4, "o_orderkey")
      Tables.bucketize(Tables.load(spark, dir, "lineitem"),
        "lineitem_b", buckets = 4, "l_orderkey")
      val joined = spark.table("lineitem_b")
        .join(spark.table("orders_b"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(sum(col("l_quantity")).as("q"))
      val plan = joined.queryExecution.executedPlan
      def shuffles(p: org.apache.spark.sql.execution.SparkPlan): Int =
        (if (p.isInstanceOf[ShuffleExchangeExec]) 1 else 0) +
          p.children.map(shuffles).sum
      // the JOIN is exchange-free (bucket co-location); the only
      // shuffle left is the final single-key aggregation
      assert(shuffles(plan) <= 1,
        s"bucketed join must not shuffle its inputs:\n${plan.treeString}")
      // and it still computes the right thing
      val viaBuckets = joined.collect()
        .map(r => r.getString(0) -> r.getDouble(1)).toMap
      val direct = Tables.load(spark, dir, "lineitem")
        .join(Tables.load(spark, dir, "orders"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(sum(col("l_quantity")).as("q"))
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      assert(viaBuckets == direct)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", oldThreshold)
      spark.sql("drop table if exists orders_b")
      spark.sql("drop table if exists lineitem_b")
    }
  }
}
