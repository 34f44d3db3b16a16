package graft.streaming

import java.sql.Timestamp

import graft.SparkTestSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

case class SessEv(ts: Timestamp, user_id: Long)

/** Streaming gap sessionization: the exact gap-boundary convention
  * (diff == gap extends, diff == gap+1µs splits — the batch q28
  * contract) and cross-micro-batch session merging with
  * watermark-driven emission. */
class StreamSessionizeSpec extends AnyFunSuite {

  private val GapUs = 1800000000L // 30 min, the q28 constant
  private def tsUs(us: Long) = Timestamp.from(java.time.Instant.EPOCH.plus(
    java.time.Duration.ofNanos(us * 1000)))

  test("gap boundary: diff == gap extends the session, gap+1µs splits") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    val base = 86400L * 1000000L
    // u1: three events exactly gap-apart — ONE session (diff == gap
    // stays); u2: second event gap+1µs later — TWO sessions
    val df = Seq(
      SessEv(tsUs(base), 1L), SessEv(tsUs(base + GapUs), 1L),
      SessEv(tsUs(base + 2 * GapUs), 1L),
      SessEv(tsUs(base), 2L), SessEv(tsUs(base + GapUs + 1), 2L)).toDF()
    val got = StreamSessionize.sessions(df, "user_id", "ts", GapUs, "1 day")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(r => (r._1, r._3))
    assert(got.toSeq == Seq(
      (1L, 3L, base, 2 * GapUs),
      (2L, 1L, base, 0L),
      (2L, 1L, base + GapUs + 1, 0L)), s"got ${got.toSeq}")
  }

  test("sessions merge across micro-batches; watermark flushes them") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[SessEv]
    val base = 86400L * 1000000L
    val q = StreamSessionize.sessions(in.toDF(), "user_id", "ts",
        GapUs, "1 hour")
      .writeStream.format("memory").queryName("sess_out")
      .outputMode("append")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("sessck").toString)
      .trigger(Trigger.ProcessingTime("100 milliseconds"))
      .start()
    def out() = spark.table("sess_out").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq

    // two batches contribute to the SAME session (10 min apart)
    in.addData(SessEv(tsUs(base), 7L))
    q.processAllAvailable()
    in.addData(SessEv(tsUs(base + 600000000L), 7L))
    q.processAllAvailable()
    assert(out().isEmpty, "open session must not emit before the watermark")

    // sentinel far in the future: watermark passes the session end
    in.addData(SessEv(tsUs(base + 10L * 3600000000L), -1L))
    q.processAllAvailable()
    in.addData(SessEv(tsUs(base + 11L * 3600000000L), -1L))
    q.processAllAvailable()
    q.stop()
    assert(out().filter(_._1 == 7L) == Seq((7L, 2L, base, 600000000L)),
      s"cross-batch events must merge into one session: ${out()}")
  }
}
