package graft.operators

import java.sql.Timestamp

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** AS-OF semantics pinned on hand-computed fixtures (the q57 oracle
  * pins them against DuckDB's native ASOF JOIN at corpus scale). */
class AsOfJoinSpec extends AnyFunSuite {

  private def ts(m: Int) = new Timestamp(60000L * m)

  test("latest right row at or before each left row; NULL when none") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    val quotes = Seq( // (key, t, px)
      ("A", ts(1), 10.0), ("A", ts(5), 11.0), ("B", ts(4), 20.0))
      .toDF("k", "t", "px")
    val trades = Seq( // (key, t, trade id)
      ("A", ts(0), 100L), // before any quote → NULL
      ("A", ts(1), 101L), // exactly at quote time → inclusive match 10.0
      ("A", ts(3), 102L), // between quotes → 10.0
      ("A", ts(9), 103L), // after latest → 11.0
      ("B", ts(6), 104L), // other key → 20.0
      ("C", ts(2), 105L)) // key with no quotes → NULL
      .toDF("k", "t", "trade")
    val got = AsOfJoin.lastAtOrBefore(trades, quotes, "k", "t", Seq("px"))
      .select(col("trade"), col("px"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(got == Map(
      100L -> None, 101L -> Some(10.0), 102L -> Some(10.0),
      103L -> Some(11.0), 104L -> Some(20.0), 105L -> None))
  }

  test("right rows tying on (key, time) resolve deterministically") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    // three quotes at the SAME (key, instant): the packed value struct
    // is the tiebreaker, so every run (and any partitioning) picks the
    // struct-wise greatest row — (12.0, 2) here
    val quotes = Seq(("A", ts(1), 10.0, 7L), ("A", ts(1), 12.0, 2L),
      ("A", ts(1), 11.0, 9L)).toDF("k", "t", "px", "sz")
    val trades = Seq(("A", ts(2), 1L)).toDF("k", "t", "trade")
    (1 to 3).foreach { n =>
      val got = AsOfJoin.lastAtOrBefore(
        trades, quotes.repartition(n * 2), "k", "t", Seq("px", "sz"))
        .select(col("px"), col("sz")).collect()
      assert(got(0).getDouble(0) == 12.0 && got(0).getLong(1) == 2L,
        s"tie must break the same way under repartition($n)")
    }
  }

  test("a matched right row with a NULL value yields NULL, not an older value") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    // (k, t=1, 5.0), (k, t=2, NULL): the latest row at t=3 IS the NULL
    // one — the as-of contract (and DuckDB ASOF) returns its NULL, not
    // the older 5.0
    val quotes = Seq(("A", ts(1), Some(5.0)), ("A", ts(2), None))
      .toDF("k", "t", "px")
    val trades = Seq(("A", ts(3), 1L)).toDF("k", "t", "trade")
    val got = AsOfJoin.lastAtOrBefore(trades, quotes, "k", "t", Seq("px"))
      .select(col("px")).collect()
    assert(got(0).isNullAt(0),
      "NULL inside the matched right row must survive, not be skipped")
  }
}
