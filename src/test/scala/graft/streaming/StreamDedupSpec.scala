package graft.streaming

import java.sql.Timestamp

import graft.SparkTestSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

case class Doc(ts: Timestamp, doc_id: Long, text: String)

/** Streaming exact dedup: duplicates dropped across micro-batches
  * within the watermark horizon; state evicted beyond it. */
class StreamDedupSpec extends AnyFunSuite {

  private def ts(minute: Int) = new Timestamp(3600000L + minute * 60000L)

  test("content dedup across micro-batches, state TTL'd by watermark") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[Doc]
    val q = StreamDedup.byContent(in.toDF(), "ts", "10 minutes")
      .select("doc_id", "text")
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("ddck").toString)
      .trigger(Trigger.ProcessingTime("100 milliseconds"))
      .start()
    def out() = spark.table("dedup_out")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq

    // batch 1: one duplicate inside the batch
    in.addData(Doc(ts(0), 1, "alpha"), Doc(ts(1), 2, "alpha"),
      Doc(ts(1), 3, "beta"))
    q.processAllAvailable()
    assert(out().map(_._2).sorted == Seq("alpha", "beta"),
      s"in-batch duplicate must drop: ${out()}")
    assert(out().filter(_._2 == "alpha").map(_._1) == Seq(1L),
      "first sighting wins")

    // batch 2: duplicate ACROSS batches still inside the horizon
    in.addData(Doc(ts(5), 4, "alpha"), Doc(ts(5), 5, "gamma"))
    q.processAllAvailable()
    assert(out().count(_._2 == "alpha") == 1, "cross-batch dup must drop")
    assert(out().exists(_._2 == "gamma"))

    // push the watermark far past the horizon: alpha's state evicts,
    // a fresh alpha is re-admitted (the documented TTL semantics)
    in.addData(Doc(ts(40), 6, "delta"))
    q.processAllAvailable()
    in.addData(Doc(ts(41), 7, "alpha"))
    q.processAllAvailable()
    assert(out().count(_._2 == "alpha") == 2,
      s"state beyond the horizon is evicted: ${out()}")
    q.stop()
  }
}
