package graft.streaming

import graft.streaming.StreamNearDup.{Banded, BucketState, Candidate}
import org.apache.spark.api.java.Optional
import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Direct property coverage of [[StreamNearDup.bucketFn]] — the
  * hand-rolled keyed state logic (FIFO member cap, lifetime-max
  * timeout math, (min,max) pair orientation) previously pinned only
  * end-to-end through a running stream. Batches are replayed through
  * Spark's own [[TestGroupState]] harness, so the GroupState contract
  * (update/remove/timeout registration) is the real one, and the
  * outputs are checked against an independent straight-line fold over
  * the concatenated batches.
  */
class StreamNearDupPropertySpec extends AnyFunSuite {

  private val Horizon = 10000L
  private val MaxM = 4
  private val SigLen = 4

  private def check(name: String, p: Prop): Unit = {
    val params = SCTest.Parameters.default
      .withMinSuccessfulTests(200)
      .withInitialSeed(Seed(4321L))
    val res = SCTest.check(params, p)
    assert(res.passed, s"$name: ${res.status}")
  }

  private def ts(ms: Long) = new java.sql.Timestamp(ms)

  private def banded(id: Long, t: Long, sig: Seq[Long]): Banded =
    Banded("b", id, ts(t), sig.toArray)

  /** Drive bucketFn across batches through TestGroupState, collecting
    * emitted candidates, per-batch registered timeouts, and the final
    * carried state. */
  private def run(batches: Seq[Seq[Banded]], maxMembers: Int = MaxM)
      : (Vector[Candidate], Vector[Long], Option[BucketState]) = {
    var st: Option[BucketState] = None
    var timeouts = Vector.empty[Long]
    var out = Vector.empty[Candidate]
    batches.foreach { rows =>
      val gs = TestGroupState.create[BucketState](
        st.fold(Optional.empty[BucketState])(Optional.of(_)),
        GroupStateTimeout.EventTimeTimeout,
        0L, Optional.of(0L), hasTimedOut = false)
      out ++= StreamNearDup.bucketFn(Horizon, maxMembers)(
        "b", rows.iterator, gs)
      st = if (gs.isRemoved) None else gs.getOption
      assert(gs.getTimeoutTimestampMs.isPresent,
        "bucketFn must always register an eviction timeout")
      timeouts :+= gs.getTimeoutTimestampMs.get()
    }
    (out, timeouts, st)
  }

  /** Independent model: one pass over the concatenated batches (each
    * batch pre-sorted the way bucketFn sorts), FIFO membership with a
    * cap, explicit match-count estimate. */
  private def reference(batches: Seq[Seq[Banded]], maxMembers: Int = MaxM)
      : (Vector[Candidate], Vector[(Long, Seq[Long])], Long) = {
    var members = Vector.empty[(Long, Seq[Long])]
    var maxTs = 0L
    var pairs = Vector.empty[Candidate]
    for (batch <- batches;
         r <- batch.sortBy(x => (x.eventTime.getTime, x.docId))) {
      for ((id, sig) <- members if id != r.docId) {
        var m = 0
        for (i <- sig.indices) if (sig(i) == r.sig(i)) m += 1
        pairs :+= Candidate(math.min(id, r.docId), math.max(id, r.docId),
          m.toDouble / sig.length, "b")
      }
      if (!members.exists(_._1 == r.docId) && members.size < maxMembers)
        members :+= (r.docId -> r.sig.toSeq)
      maxTs = math.max(maxTs, r.eventTime.getTime)
    }
    (pairs, members, maxTs)
  }

  private val rowGen: Gen[Banded] = for {
    id <- Gen.chooseNum(0L, 7L)
    t <- Gen.chooseNum(1L, 20000L)
    sig <- Gen.listOfN(SigLen, Gen.chooseNum(0L, 2L))
  } yield banded(id, t, sig)

  private val batchesGen: Gen[List[List[Banded]]] =
    Gen.chooseNum(1, 4).flatMap(n => Gen.listOfN(n,
      Gen.chooseNum(0, 6).flatMap(m => Gen.listOfN(m, rowGen))))

  test("multi-batch fold ≡ independent single-pass model") {
    check("fold", Prop.forAll(batchesGen) { batches =>
      val (got, _, st) = run(batches)
      val (want, wantMembers, _) = reference(batches)
      got == want &&
        st.map(s => s.docIds.zip(s.sigs.map(_.toSeq)))
          .getOrElse(Nil) == wantMembers.map(m => (m._1, m._2)).toList
    })
  }

  test("invariants: orientation, no self-pairs, cap, distinct members") {
    check("invariants", Prop.forAll(batchesGen) { batches =>
      val (got, _, st) = run(batches)
      got.forall(c => c.doc1 < c.doc2) &&
        st.forall(s => s.docIds.size <= MaxM &&
          s.docIds.distinct == s.docIds &&
          s.docIds.size == s.sigs.size)
    })
  }

  test("timeout = lifetime max event time + horizon, never pulled earlier") {
    check("timeout", Prop.forAll(batchesGen) { batches =>
      val (_, timeouts, _) = run(batches)
      val runningMax = batches.scanLeft(0L) { (acc, b) =>
        (acc +: b.map(_.eventTime.getTime)).max
      }.tail
      timeouts == runningMax.map(_ + Horizon).toVector &&
        timeouts.zip(timeouts.drop(1)).forall { case (a, b) => a <= b }
    })
  }

  test("a late-but-valid row must NOT pull eviction earlier") {
    val sig = Seq(1L, 1L, 1L, 1L)
    val (_, timeouts, _) = run(Seq(
      Seq(banded(1, 9000, sig)),
      // batch 2 arrives later in processing time but EARLIER in event
      // time (late row still above the watermark): the registered
      // eviction must stay horizon-beyond-9000, not drop to 500+horizon
      Seq(banded(2, 500, sig))))
    assert(timeouts == Vector(9000L + Horizon, 9000L + Horizon))
  }

  test("cap overflow: row still pairs against members but is not stored") {
    val sig = Seq(1L, 1L, 1L, 1L)
    val fill = (1L to MaxM.toLong).map(i => banded(i, i * 10, sig))
    val (pairs, _, st) = run(Seq(fill, Seq(banded(99, 1000, sig))))
    assert(st.get.docIds == (1L to MaxM.toLong).toList,
      "FIFO membership must be the first MaxM distinct ids")
    assert(pairs.count(c => c.doc2 == 99L) == MaxM,
      "the overflowing row must still emit a candidate per stored member")
  }

  test("duplicate docId: no self-pair, not re-added, estimate exact") {
    val a = Seq(0L, 1L, 2L, 3L)
    val b = Seq(0L, 1L, 9L, 9L) // 2 of 4 positions match
    val (pairs, _, st) = run(Seq(
      Seq(banded(5, 100, a)),
      Seq(banded(5, 200, a), banded(6, 300, b))))
    assert(st.get.docIds == List(5L, 6L))
    assert(pairs == Vector(Candidate(5L, 6L, 0.5, "b")))
  }

  test("timed-out bucket: state removed, nothing emitted") {
    val gs = TestGroupState.create[BucketState](
      Optional.of(BucketState(List(1L), List(Array(1L)), 50L)),
      GroupStateTimeout.EventTimeTimeout,
      0L, Optional.of(100000L), hasTimedOut = true)
    val out = StreamNearDup.bucketFn(Horizon, MaxM)(
      "b", Iterator.empty, gs)
    assert(out.isEmpty && gs.isRemoved)
  }
}
