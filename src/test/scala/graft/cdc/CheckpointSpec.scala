package graft.cdc

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Checkpoint total order incl. unsigned LSNs ≥ 2^63 — the
  * reference's cursor.Checkpoint.After (pkg/cursor/main.go:13-48) is
  * unsigned-lexicographic; both the case-class compare and the
  * DataFrame-level afterCheckpoint filter must agree. */
class CheckpointSpec extends AnyFunSuite {

  test("unsigned lexicographic order") {
    assert(Checkpoint(2, 0) > Checkpoint(1, 99))
    assert(Checkpoint(1, 2) > Checkpoint(1, 1))
    assert(!(Checkpoint(1, 1) > Checkpoint(1, 1)))
    // LSN ≥ 2^63 (negative as signed) sorts ABOVE small LSNs
    val big = Checkpoint(Long.MinValue, 0) // = 2^63 unsigned
    assert(big > Checkpoint(Long.MaxValue, 5))
    assert(Checkpoint(-1L, 0) > big) // 2^64-1 is the largest
  }

  test("serialize / parse round-trip incl. high LSNs") {
    for (cp <- Seq(Checkpoint.Zero, Checkpoint(0x16B374D848L, 7),
        Checkpoint(-1L, Int.MaxValue), Checkpoint(Long.MinValue, 1))) {
      assert(Checkpoint.parse(cp.serialize) == cp)
    }
  }

  test("PITR log scan recovers the last consistent-recovery LSN (A21)") {
    val log = Seq(
      "2024-01-01 LOG:  starting point-in-time recovery",
      "2024-01-01 LOG:  consistent recovery state reached at 0/1A2B3C4D",
      "2024-01-01 LOG:  redo done at 2/00FF0001",
      "2024-01-01 LOG:  last completed transaction was at log time 2024-01-01 10:00:00.5+00.",
      "2024-01-01 LOG:  database system is ready")
    val cp = PitrLog.scanCheckpointFromLog(log.iterator)
    // the LAST lsn line wins (redo done supersedes consistent-state)
    assert(cp.lsnText.contains("2/00FF0001"))
    assert(cp.lsn.contains((2L << 32) | 0x00FF0001L))
    assert(cp.txTime.exists(_.startsWith("2024-01-01 10:00:00.5+00")))
    // no recovery lines → empty, caller falls back to the watermark
    assert(PitrLog.scanCheckpointFromLog(Iterator("LOG: ready")).lsn.isEmpty)
    assert(PitrLog.parseLsn("0/0") == 0L)
  }

  test("afterCheckpoint DataFrame filter matches case-class compare") {
    val spark = graft.SparkTestSession.spark
    import spark.implicits._
    val cps = Seq(
      (1L, 1), (1L, 2), (2L, 0), (Long.MaxValue, 0),
      (Long.MinValue, 0), (Long.MinValue, 1), (-1L, 0))
    val df = cps.toDF("lsn", "seq")
    for (wm <- Seq(Checkpoint(1, 1), Checkpoint(Long.MaxValue, 0),
        Checkpoint(Long.MinValue, 0))) {
      val got = CdcApply.afterCheckpoint(df, wm)
        .collect().map(r => Checkpoint(r.getLong(0), r.getInt(1))).toSet
      val want = cps.map { case (l, s) => Checkpoint(l, s) }
        .filter(_.after(wm)).toSet
      assert(got == want, s"watermark $wm")
    }
  }
}
