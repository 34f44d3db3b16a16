package graft.operators

import java.sql.Timestamp

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Containment semantics pinned on hand fixtures (q66 pins them
  * against a DuckDB inequality join at corpus scale). */
class IntervalJoinSpec extends AnyFunSuite {

  private def ts(m: Int) = new Timestamp(60000L * m)
  private val MinuteUs = 60L * 1000 * 1000

  test("half-open containment per key; multi-bucket intervals; no duplicates") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    val points = Seq(
      ("A", ts(0), 1L),  // exactly at i1.start → inclusive
      ("A", ts(5), 2L),  // inside i1
      ("A", ts(10), 3L), // exactly at i1.end → exclusive
      ("A", ts(25), 4L), // inside the long i2 (spans many buckets)
      ("B", ts(5), 5L),  // same instant as point 2, other key
      ("C", ts(5), 6L))  // key with no intervals
      .toDF("k", "t", "pid")
    val intervals = Seq(
      ("A", ts(0), ts(10), 10L),  // i1
      ("A", ts(20), ts(60), 11L), // i2: 40 min ≫ bucket width
      ("B", ts(4), ts(6), 12L),   // i3
      ("A", ts(30), ts(30), 13L)) // empty interval → matches nothing
      .toDF("k", "s", "e", "iid")
    // bucket = 7 min: i1 spans 2 buckets, i2 spans 7 — pairs must
    // still come out exactly once
    val got = IntervalJoin.pointInInterval(points, intervals,
        "k", "t", "s", "e", bucketMicros = 7 * MinuteUs)
      .select(col("pid"), col("iid")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(got == Seq((1L, 10L), (2L, 10L), (4L, 11L), (5L, 12L)))
  }

  test("bucket width much smaller than intervals still yields exact pairs") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    val points = Seq(("A", ts(59), 1L), ("A", ts(61), 2L)).toDF("k", "t", "pid")
    val intervals = Seq(("A", ts(0), ts(60), 9L)).toDF("k", "s", "e", "iid")
    val got = IntervalJoin.pointInInterval(points, intervals,
        "k", "t", "s", "e", bucketMicros = MinuteUs)
      .select(col("pid")).collect().map(_.getLong(0)).toSeq
    assert(got == Seq(1L), "t=61 is past the half-open end")
  }
}
