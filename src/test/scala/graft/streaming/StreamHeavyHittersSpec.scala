package graft.streaming

import graft.SparkTestSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming count-min sketch: state stays capped at Depth·Width cells
  * whatever the vocabulary, the incrementally-folded sketch is
  * bit-identical to the batch-built one over the same tokens (the
  * streaming ≡ batch contract), and every point estimate respects the
  * CMS overcount guarantee. */
class StreamHeavyHittersSpec extends AnyFunSuite {

  test("streaming sketch == batch sketch; state bounded; est >= true") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    implicit val ctx = spark.sqlContext

    // skewed vocabulary across three micro-batches: 'hot' dominates
    val b1 = Seq.fill(40)("hot") ++ (1 to 25).map(i => s"rare$i")
    val b2 = Seq.fill(30)("hot") ++ Seq.fill(10)("warm") ++
      (26 to 50).map(i => s"rare$i")
    val b3 = Seq.fill(30)("hot") ++ Seq.fill(15)("warm") ++
      (51 to 75).map(i => s"rare$i")

    val in = MemoryStream[String]
    val q = StreamHeavyHitters.sketch(in.toDF().toDF("tk"))
      .writeStream.format("memory").queryName("cms_cells")
      .outputMode("complete")
      .start()
    Seq(b1, b2, b3).foreach { b => in.addData(b); q.processAllAvailable() }

    val streamCells = spark.table("cms_cells")
    // bounded state: the sketch can never exceed Depth·Width rows
    // (and the state operator reports the same cap)
    assert(streamCells.count() <=
      StreamHeavyHitters.Depth.toLong * StreamHeavyHitters.Width)
    assert(q.lastProgress.stateOperators.head.numRowsTotal <=
      StreamHeavyHitters.Depth.toLong * StreamHeavyHitters.Width)

    // streaming ≡ batch: folding micro-batches must equal one batch
    // build over the concatenated data, cell for cell
    val all = (b1 ++ b2 ++ b3).toDF("tk")
    val batchCells = StreamHeavyHitters.sketch(all)
    val diff = streamCells.withColumnRenamed("cnt", "s")
      .join(batchCells.withColumnRenamed("cnt", "b"), Seq("d", "bucket"), "full")
      .filter(coalesce(col("s"), lit(-1)) =!= coalesce(col("b"), lit(-1)))
    assert(diff.isEmpty, s"stream/batch cell mismatch: ${diff.collect().toSeq}")
    q.stop()

    // CMS guarantee on point estimates: est >= true for every token,
    // and the heavy hitter ranks first by estimate
    val truth = all.groupBy(col("tk")).agg(count(lit(1)).as("true_cnt"))
    val est = StreamHeavyHitters.estimate(streamCells, truth.select("tk"))
    val joined = est.join(truth, "tk").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(joined.nonEmpty)
    joined.foreach { case (tk, e, t) =>
      assert(e >= t, s"CMS undercount for $tk: est $e < true $t")
    }
    val top = joined.maxBy(_._2)._1
    assert(top == "hot", s"heavy hitter must rank first, got $top")

    // unseen-token point lookup: the sketch stores only touched cells,
    // so the estimate must read untouched cells as the zero cell a
    // dense CMS would hold (left join + coalesce) — est = 0 unless
    // every one of its 4 cells collides with stored tokens (it doesn't
    // here: vocabulary is ~77 tokens over 1024 cells, and the probe's
    // cells were checked untouched when this fixture was pinned)
    val unseen = StreamHeavyHitters.estimate(
      streamCells, Seq("never_streamed_token").toDF("tk")).collect()
    assert(unseen.length == 1 && unseen.head.getLong(1) == 0L,
      s"unseen token must estimate 0, got ${unseen.toSeq}")
  }
}
