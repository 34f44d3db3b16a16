package graft.streaming

import graft.cdc.Checkpoint
import graft.streaming.DbLog._
import org.scalatest.funsuite.AnyFunSuite

/** Scheduler round-robin / backoff / one-outstanding-per-client and the
  * LSN staleness guard — mirroring reference pkg/dblog/scheduler_test.go
  * and pkg/dblog/dumper.go:172-186. */
class DbLogSpec extends AnyFunSuite {

  private def d(lo: Long) = DumpInfo("public", "t", lo, lo + 9)

  test("one outstanding dump per client; ack releases the next") {
    val s = new Scheduler
    s.schedule("uri", Seq(d(0), d(10), d(20)))
    assert(s.poll("uri", "c1").contains(d(0)))
    assert(s.poll("uri", "c1").isEmpty, "c1 must ack before next")
    assert(s.poll("uri", "c2").contains(d(10)), "other client proceeds")
    s.ack("uri", "c1", requeue = false)
    assert(s.poll("uri", "c1").contains(d(20)))
    s.ack("uri", "c1", requeue = false)
    s.ack("uri", "c2", requeue = false)
    assert(s.poll("uri", "c1").isEmpty && s.pendingCount("uri") == 0)
  }

  test("nack requeues with exponential backoff 2·2ⁿ capped at n=8") {
    var now = 0L
    val s = new Scheduler(nowMs = () => now)
    s.schedule("uri", Seq(d(0)))
    for (attempt <- 0 until 11) {
      assert(s.poll("uri", "c").contains(d(0)), s"attempt $attempt")
      s.ack("uri", "c", requeue = true)
      val n = math.min(attempt, 8)
      val backoff = 2000L * (1L << n)
      assert(s.poll("uri", "c").isEmpty, "not due before backoff")
      now += backoff - 1
      assert(s.poll("uri", "c").isEmpty, "still one ms early")
      now += 1
    }
    assert(s.poll("uri", "c").contains(d(0)))
  }

  test("cool-down adds to the requeue delay; stopSchedule drains") {
    var now = 0L
    val s = new Scheduler(coolDownMs = 500L, nowMs = () => now)
    s.schedule("uri", Seq(d(0)))
    assert(s.poll("uri", "c").isDefined)
    s.ack("uri", "c", requeue = true)
    now += 2000L // backoff alone elapsed, cool-down not yet
    assert(s.poll("uri", "c").isEmpty)
    now += 500L
    assert(s.poll("uri", "c").isDefined)
    s.ack("uri", "c", requeue = true)
    s.stopSchedule("uri")
    now += 1000000L
    assert(s.poll("uri", "c").isEmpty && s.pendingCount("uri") == 0)
  }

  test("LSN staleness guard (ErrLSNFallBehind analog)") {
    requireFresh(Checkpoint(100, 0), 100) // equal is fresh enough
    requireFresh(Checkpoint(101, 0), 100)
    intercept[LsnFallBehind] { requireFresh(Checkpoint(99, 0), 100) }
    // unsigned comparison: replica at 2^63 serves a client at MaxValue
    requireFresh(Checkpoint(Long.MinValue, 0), Long.MaxValue)
    intercept[LsnFallBehind] {
      requireFresh(Checkpoint(Long.MaxValue, 0), Long.MinValue)
    }
  }

  test("ctid predicates mirror the reference DumpQuery block ranges") {
    assert(ctidRangePredicate(0, 4095) ==
      "ctid >= '(0,0)'::tid AND ctid <= '(4095,65535)'::tid")
    assert(pageRanges(10, 3) == Seq((0L, 2L), (3L, 5L), (6L, 8L), (9L, 9L)))
    assert(plan("public", "t", 8, 4) == Seq(
      DumpInfo("public", "t", 0, 3), DumpInfo("public", "t", 4, 7)))
  }

  test("TID-range scan: one input partition per page range, full coverage") {
    // same plumbing as the PG ctid scan, against embedded Derby with a
    // plain page-column predicate (Derby has no ctid)
    val conn = java.sql.DriverManager
      .getConnection("jdbc:derby:memory:dump1;create=true")
    val st = conn.createStatement()
    st.execute("create table pages(pg int, id int, val int)")
    val ins = conn.prepareStatement("insert into pages values (?, ?, ?)")
    (0 until 100).foreach { i =>
      ins.setInt(1, i / 10); ins.setInt(2, i); ins.setInt(3, i * 2)
      ins.addBatch()
    }
    ins.executeBatch(); conn.commit(); st.close()

    val spark = graft.SparkTestSession.spark
    val props = new java.util.Properties()
    props.put("driver", "org.apache.derby.jdbc.EmbeddedDriver")
    val df = tidRangeScan(spark, "jdbc:derby:memory:dump1", "pages",
      maxPages = 10, pagesPerChunk = 3, props,
      predicateFor = (b, e) => s"pg >= $b AND pg <= $e")
    assert(df.rdd.getNumPartitions == 4, "one partition per page range")
    assert(df.count() == 100, "ranges cover every row exactly once")
    // dump rows flow on as UPDATEs at (lsn=0, seq=dumpId) — the q47 merge
    val up = dumpAsUpdates(df, dumpId = 3)
    assert(up.filter(org.apache.spark.sql.functions.col("op") === "UPDATE")
      .count() == 100)
    conn.close()
  }

  test("dumpAsUpdates stamps the (lsn=0, seq=dumpId) convention") {
    val spark = graft.SparkTestSession.spark
    import spark.implicits._
    val out = dumpAsUpdates(Seq((1, "a"), (2, "b")).toDF("id", "v"), dumpId = 7)
      .collect()
    assert(out.forall(r => r.getAs[String]("op") == "UPDATE"
      && r.getAs[Long]("lsn") == 0L && r.getAs[Int]("seq") == 7))
  }
}
