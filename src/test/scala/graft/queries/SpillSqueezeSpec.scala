package graft.queries

import graft.{SparkEntry, SparkTestSession}
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.scalatest.funsuite.AnyFunSuite

/** Memory-squeeze guard-rail for the big composed pipelines: the
  * 100 TB posture claims the plans DEGRADE (spill to disk) rather than
  * fail when execution memory is short. Local heaps are far too big
  * for sf fixtures to pressure naturally, so the squeeze forces the
  * operators' own spill paths: row-buffer spill thresholds dropped to
  * a few rows (sort-merge join / window buffers go external) and the
  * shuffle width cut to 2 partitions (each task carries half the
  * data). Under that regime the dedup pipeline compositions — the
  * suite's heaviest multi-join, multi-agg plans — must (a) complete,
  * (b) produce byte-identical answers to the unsqueezed run, and
  * (c) actually have spilled, proving the exercised code path is the
  * external one, not a comfortable in-memory pass. */
class SpillSqueezeSpec extends AnyFunSuite {

  private val sfDir = "/root/testdata/sf0.01"

  test("q105/q120 degrade (spill) rather than fail under memory squeeze") {
    val base = SparkTestSession.spark
    val squeezed = base.newSession()
    squeezed.conf.set("spark.sql.shuffle.partitions", "2")
    // no broadcast escape hatch: every join must take the shuffle path
    // whose buffers are the thing being squeezed
    squeezed.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    // a few-row threshold sends every sort-merge-join / window buffer
    // through its external (spilling) implementation: the in.memory
    // threshold hands the buffer to the spillable sorter after 16
    // rows (default 4096 — small fixtures never leave the in-memory
    // array without this), and the spill threshold forces that sorter
    // to disk after 64
    for (op <- Seq("sortMergeJoinExec", "windowExec", "sessionWindow")) {
      squeezed.conf.set(s"spark.sql.$op.buffer.in.memory.threshold", "16")
      squeezed.conf.set(s"spark.sql.$op.buffer.spill.threshold", "64")
    }

    val spilled = new java.util.concurrent.atomic.AtomicLong(0L)
    val listener = new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null)
          spilled.addAndGet(m.memoryBytesSpilled + m.diskBytesSpilled)
        ()
      }
    }
    base.sparkContext.addSparkListener(listener)
    try {
      // q149 (type-keyed running windows — thousands of rows per
      // window partition at this sf) rides along to pin that the
      // squeeze genuinely drives the EXTERNAL buffer implementation:
      // its per-type buffers dwarf the row thresholds, so bytes MUST
      // spill — the dedup compositions avoid window sorts by design,
      // so they prove degrade-not-fail while q149 proves the spill
      // path engaged.
      for (q <- Seq("q105_quality_dedup", "q120_dedup_quality_report",
          "q149_cusum_drift")) {
        val want = SparkEntry.queries(q)(base, sfDir).collect().toSeq
        val got = SparkEntry.queries(q)(squeezed, sfDir).collect().toSeq
        assert(got == want,
          s"$q must produce identical rows under the squeeze")
      }
      assert(spilled.get() > 0L,
        "the squeeze must actually exercise the spill path " +
          s"(bytes spilled = ${spilled.get()})")
    } finally base.sparkContext.removeSparkListener(listener)
  }
}
