package graft.streaming

import java.sql.Timestamp

import graft.SparkTestSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** Streaming window operators over event time (SURVEY §2B Streaming):
  * watermark-gated tumbling windows (append mode: a window only emits
  * once the watermark passes it, and later late data is dropped) and
  * session windows with gap timeout — the real `withWatermark` /
  * `window` / `session_window` operators, not batch analogs.
  */
case class Ev(ts: Timestamp, user: String, value: Double)

class StreamingWindowsSpec extends AnyFunSuite {

  private def ts(minute: Int) = new Timestamp(3600000L + minute * 60000L)

  test("tumbling window agg with watermark: emit-on-watermark, late drop") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[Ev]
    val q = in.toDS()
      .withWatermark("ts", "5 minutes")
      .groupBy(window(col("ts"), "10 minutes"), col("user"))
      .agg(count(lit(1)).as("cnt"), sum(col("value")).as("s"))
      .select(col("window.start").as("ws"), col("user"), col("cnt"), col("s"))
      .writeStream.format("memory").queryName("win_out")
      .outputMode("append")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("winck").toString)
      .trigger(Trigger.ProcessingTime("100 milliseconds"))
      .start()
    def out() = spark.table("win_out")
      .collect().map(r => (r.getTimestamp(0).getTime, r.getString(1),
        r.getLong(2), r.getDouble(3))).toSeq

    // window [60,70): two events for u1, one for u2
    in.addData(Ev(ts(1), "u1", 1.0), Ev(ts(4), "u1", 2.0), Ev(ts(6), "u2", 5.0))
    q.processAllAvailable()
    assert(out().isEmpty, "append mode holds windows until watermark passes")

    // advance event time beyond 70+5min watermark → [60,70) finalizes
    in.addData(Ev(ts(16), "u1", 9.0))
    q.processAllAvailable()
    in.addData(Ev(ts(30), "u3", 1.0)) // push watermark over [70,80) too
    q.processAllAvailable()
    val finalized = out().filter(_._1 == 3600000L)
    assert(finalized.toSet == Set(
      (3600000L, "u1", 2L, 3.0), (3600000L, "u2", 1L, 5.0)))

    // a late event for the finalized window (event time behind the
    // watermark) must be DROPPED, not re-emitted
    in.addData(Ev(ts(2), "u1", 100.0))
    q.processAllAvailable()
    in.addData(Ev(ts(31), "u3", 1.0))
    q.processAllAvailable()
    assert(out().filter(_._1 == 3600000L) == finalized,
      "late data past the watermark is dropped")
    q.stop()
  }

  test("stream-stream interval join with watermark-bounded state") {
    // the attribution-join shape: a click joins its impression only
    // within [imp.ts, imp.ts + 10']; watermarks on BOTH sides let the
    // engine expire join state instead of buffering streams forever
    val spark = SparkTestSession.spark
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val imps = MemoryStream[Ev] // user = ad id, value = impression id
    val clicks = MemoryStream[Ev]
    val q = imps.toDF()
      .select(col("ts").as("its"), col("user").as("ad"), col("value").as("imp_id"))
      .withWatermark("its", "5 minutes")
      .join(
        clicks.toDF()
          .select(col("ts").as("cts"), col("user").as("c_ad"), col("value").as("click_id"))
          .withWatermark("cts", "5 minutes"),
        expr("ad = c_ad AND cts >= its AND cts <= its + interval 10 minutes"))
      .select(col("ad"), col("imp_id"), col("click_id"))
      .writeStream.format("memory").queryName("join_out")
      .outputMode("append")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("jck").toString)
      .trigger(Trigger.ProcessingTime("100 milliseconds"))
      .start()

    imps.addData(Ev(ts(0), "adA", 1.0), Ev(ts(0), "adB", 2.0))
    // in-window click for adA (4' after), out-of-window click for adB (20')
    clicks.addData(Ev(ts(4), "adA", 101.0), Ev(ts(20), "adB", 202.0))
    q.processAllAvailable()
    val got = spark.table("join_out").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2))).toSet
    assert(got == Set(("adA", 1.0, 101.0)),
      s"only the in-window click attributes: $got")

    // a second in-window click still joins (state not yet expired)
    clicks.addData(Ev(ts(8), "adA", 102.0))
    q.processAllAvailable()
    assert(spark.table("join_out").count() == 2)
    q.stop()
  }

  test("session windows: 10-minute gap splits sessions per user") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[Ev]
    val q = in.toDS()
      .withWatermark("ts", "5 minutes")
      .groupBy(session_window(col("ts"), "10 minutes"), col("user"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("session_window.start").as("ss"),
        col("session_window.end").as("se"), col("user"), col("cnt"))
      .writeStream.format("memory").queryName("sess_out")
      .outputMode("append")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("sessck").toString)
      .trigger(Trigger.ProcessingTime("100 milliseconds"))
      .start()

    // u1: events at 1' and 5' (one session: gap < 10'), then 30' (new
    // session); u2: single event
    in.addData(Ev(ts(1), "u1", 0), Ev(ts(5), "u1", 0), Ev(ts(2), "u2", 0))
    q.processAllAvailable()
    in.addData(Ev(ts(30), "u1", 0))
    q.processAllAvailable()
    in.addData(Ev(ts(60), "u3", 0)) // watermark push finalizes everything ≤ 55'
    q.processAllAvailable()

    val got = spark.table("sess_out").collect()
      .map(r => (r.getString(2), r.getTimestamp(0).getTime,
        r.getTimestamp(1).getTime, r.getLong(3))).toSet
    assert(got.contains(("u1", ts(1).getTime, ts(5).getTime + 600000L, 2L)),
      s"merged session: $got")
    assert(got.contains(("u1", ts(30).getTime, ts(30).getTime + 600000L, 1L)),
      s"gap split: $got")
    assert(got.contains(("u2", ts(2).getTime, ts(2).getTime + 600000L, 1L)))
    q.stop()
  }
}
