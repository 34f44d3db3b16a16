package graft.streaming

import java.sql.Timestamp

import graft.SparkTestSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** Streaming MinHash-LSH near-dup: candidates surface across
  * micro-batches, estimates match the batch sketch bit-for-bit, and
  * bucket state is evicted by the event-time watermark. */
class StreamNearDupSpec extends AnyFunSuite {

  private def ts(minute: Int) = new Timestamp(3600000L + minute * 60000L)

  private val base = (1 to 30).map(i => s"w$i").mkString(" ")
  private val nearDup = (1 to 29).map(i => s"w$i").mkString(" ") + " zz"
  private val other = (1 to 30).map(i => s"v$i").mkString(" ")

  /** The batch-side MinHash estimate for two texts, via the same
    * shingle + minhash_sig pipeline the stream runs. */
  private def batchEstimate(a: String, b: String): Double = {
    val spark = SparkTestSession.spark
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val sigs = Seq(a, b).toDF("text")
      .select(expr(
        """minhash_sig(array_distinct(transform(
          |  sequence(0, size(split(lower(trim(text)), '\\s+'))-3),
          |  i -> concat_ws(' ', split(lower(trim(text)), '\\s+')[i],
          |       split(lower(trim(text)), '\\s+')[i+1],
          |       split(lower(trim(text)), '\\s+')[i+2]))))""".stripMargin)
        .as("sig"))
      .collect().map(_.getSeq[Long](0).toArray)
    StreamNearDup.estimate(sigs(0), sigs(1))
  }

  test("near-dup candidates across batches; estimate == batch sketch; TTL evicts") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[Doc]
    val q = StreamNearDup.candidates(in.toDF(), "ts", "10 minutes")
      .writeStream.format("memory").queryName("neardup_out")
      .outputMode("append")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("ndck").toString)
      .trigger(Trigger.ProcessingTime("100 milliseconds"))
      .start()
    def pairs() = spark.table("neardup_out")
      .select("doc1", "doc2", "estJaccard").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

    // batch 1: base + an unrelated doc — no collision expected
    in.addData(Doc(ts(0), 1, base), Doc(ts(0), 2, other))
    q.processAllAvailable()
    assert(pairs().isEmpty, s"unrelated docs must not pair: ${pairs()}")

    // batch 2: a near-dup of doc 1 arrives — the pair surfaces with
    // the batch pipeline's exact MinHash estimate
    in.addData(Doc(ts(1), 3, nearDup))
    q.processAllAvailable()
    val expEst = batchEstimate(base, nearDup)
    assert(expEst > 0.5, s"fixture texts must be sketch-similar: $expEst")
    assert(pairs() == Set((1L, 3L, expEst)), s"got ${pairs()}")

    // batch 3: an exact duplicate pairs with both at estimate 1.0 on
    // its copy and expEst on the near-dup
    in.addData(Doc(ts(2), 4, base))
    q.processAllAvailable()
    assert(pairs() == Set((1L, 3L, expEst), (1L, 4L, 1.0), (3L, 4L, expEst)),
      s"got ${pairs()}")

    // advance the watermark far past the horizon, then replay the base
    // text as a new id: old bucket state must be gone — no pair with
    // docs 1/3/4 appears
    in.addData(Doc(ts(40), 5, (1 to 30).map(i => s"u$i").mkString(" ")))
    q.processAllAvailable()
    in.addData(Doc(ts(41), 6, base))
    q.processAllAvailable()
    assert(!pairs().exists(p => p._2 == 6L),
      s"evicted state must not pair with a late arrival: ${pairs()}")
    q.stop()
  }

  test("bucket membership cap bounds state; estimate counts positions") {
    import org.apache.spark.sql.streaming.TestGroupState
    assert(StreamNearDup.estimate(Array(1L, 2L, 3L), Array(1L, 2L, 4L)) == 2.0 / 3)

    val state = TestGroupState.create[StreamNearDup.BucketState](
      optionalState = org.apache.spark.api.java.Optional.empty(),
      timeoutConf =
        org.apache.spark.sql.streaming.GroupStateTimeout.EventTimeTimeout,
      batchProcessingTimeMs = 1000L,
      eventTimeWatermarkMs = org.apache.spark.api.java.Optional.of(0L),
      hasTimedOut = false)
    val rows = (1 to 5).map(i =>
      StreamNearDup.Banded("bk", i.toLong, ts(i), Array.fill(64)(i.toLong)))
    val out = StreamNearDup.bucketFn(600000L, maxMembers = 3)(
      "bk", rows.iterator, state).toSeq
    // every arrival pairs against the members stored BEFORE it; only
    // the first 3 docs are retained under the cap
    assert(state.get.docIds == List(1L, 2L, 3L))
    assert(out.map(c => (c.doc1, c.doc2)) ==
      Seq((1L, 2L), (1L, 3L), (2L, 3L), (1L, 4L), (2L, 4L), (3L, 4L),
        (1L, 5L), (2L, 5L), (3L, 5L)))
    assert(out.forall(_.estJaccard == 0.0), "distinct sigs never match")
  }
}
