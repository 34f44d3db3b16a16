package graft.streaming

import graft.functions.{GraftFunctions, MinHashSig}
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming near-duplicate detection — the ingestion-time face of the
  * q35 batch MinHash+LSH pass (training-data pipelines screen appends
  * against the recent corpus on the way in, then run the exact batch
  * dedup over landed data on a schedule).
  *
  * Shape: per-row shingle → [[graft.functions.MinHashSig]] signature
  * (the identical 64-permutation sketch the batch path uses, so
  * streaming estimates and batch verdicts never disagree about the
  * sketch) → explode to the 32 two-row LSH band keys → keyed
  * `flatMapGroupsWithState` where the state is the bucket's member
  * list. A new document colliding with a stored member emits a
  * candidate pair scored by the MinHash estimate (matching signature
  * positions / 64 — an unbiased Jaccard estimator, σ ≤ 1/16 at 64
  * permutations).
  *
  * 100 TB design notes:
  *  - state is partitioned by the band-bucket key (the same shuffle
  *    key as the batch LSH), bounded by (bucket arrival rate ×
  *    watermark horizon), and evicted by EVENT-time timeout — a
  *    quiet bucket costs nothing after the horizon passes;
  *  - per-bucket membership is capped ([[MaxMembers]], FIFO): a
  *    pathological boilerplate clique degrades recall inside that
  *    bucket instead of growing state without bound — run
  *    [[StreamDedup.byContent]] upstream so exact duplicates (the
  *    dominant clique source) never reach the LSH state, and rely on
  *    the scheduled batch q35 pass as the exactness backstop;
  *  - a true near-dup pair collides in several of its 32 bands and
  *    emits once per colliding band; dedup is a
  *    `dropDuplicates(doc1, doc2)` in the consumer (per micro-batch
  *    via foreachBatch, or windowed) — done here it would cost a
  *    second stateful shuffle on every candidate;
  *  - state-store sizing: wrap the query START in
  *    [[StreamRun.withStatePartitions]] when the bucket population is
  *    much smaller than the session's batch shuffle width (see that
  *    object's scaladoc for why this cannot be a parameter here).
  */
object StreamNearDup {

  /** Bucket membership cap — the streaming analogue of
    * [[graft.queries.Sketches.MaxBucketSize]]. */
  final val MaxMembers = 64

  final case class Banded(bucket: String, docId: Long,
      eventTime: java.sql.Timestamp, sig: Array[Long])
  final case class BucketState(docIds: List[Long], sigs: List[Array[Long]],
      maxTsMs: Long)
  final case class Candidate(doc1: Long, doc2: Long, estJaccard: Double,
      bucket: String)

  /** MinHash Jaccard estimate: matching positions / 64. */
  private[streaming] def estimate(a: Array[Long], b: Array[Long]): Double = {
    var m = 0; var i = 0
    while (i < a.length) { if (a(i) == b(i)) m += 1; i += 1 }
    m.toDouble / a.length
  }

  private[streaming] def bucketFn(horizonMs: Long, maxMembers: Int)(
      bucket: String, rows: Iterator[Banded],
      state: GroupState[BucketState]): Iterator[Candidate] = {
    if (state.hasTimedOut) { state.remove(); return Iterator.empty }
    val out = Seq.newBuilder[Candidate]
    var st = state.getOption.getOrElse(BucketState(Nil, Nil, 0L))
    // arrival order within a batch follows the iterator; pairs orient
    // (min, max) so the output is a set regardless of order
    rows.toSeq.sortBy(r => (r.eventTime.getTime, r.docId)).foreach { r =>
      st.docIds.iterator.zip(st.sigs.iterator).foreach { case (id, sig) =>
        if (id != r.docId)
          out += Candidate(math.min(id, r.docId), math.max(id, r.docId),
            estimate(sig, r.sig), bucket)
      }
      val keep = !st.docIds.contains(r.docId) && st.docIds.size < maxMembers
      st = BucketState(
        if (keep) st.docIds :+ r.docId else st.docIds,
        if (keep) st.sigs :+ r.sig else st.sigs,
        // lifetime max, NOT this batch's max: a late-but-valid row in
        // a later batch must not pull the eviction earlier than the
        // horizon beyond the NEWEST member ever stored
        math.max(st.maxTsMs, r.eventTime.getTime))
    }
    state.update(st)
    // evict once the watermark passes the horizon beyond the newest
    // member — quiet buckets disappear from the store
    state.setTimeoutTimestamp(st.maxTsMs + horizonMs)
    out.result().iterator
  }

  /** Candidate near-dup pairs over a streaming `docs(doc_id, text,
    * tsCol)` frame. `horizon` (e.g. "10 minutes") is both the
    * watermark delay and the state retention window. */
  def candidates(docs: DataFrame, tsCol: String, horizon: String,
      maxMembers: Int = MaxMembers): Dataset[Candidate] = {
    val spark = docs.sparkSession
    import spark.implicits._
    GraftFunctions.register(spark)
    val iv = org.apache.spark.sql.catalyst.util.IntervalUtils
      .stringToInterval(
        org.apache.spark.unsafe.types.UTF8String.fromString(horizon))
    require(iv.months == 0, "horizon must use day-or-smaller units")
    val horizonMs = iv.days * 86400000L + iv.microseconds / 1000L
    // the watermarked attribute (eventTime) flows to the stateful
    // operator unmapped — a typed .map would re-serialize and strip
    // the watermark metadata the event-time timeout needs
    val banded = docs
      .withWatermark(tsCol, horizon)
      .select(col("doc_id").as("docId"), col(tsCol).as("eventTime"),
        split(lower(trim(col("text"))), "\\s+").as("toks"))
      .filter(size(col("toks")) >= 3)
      .select(col("docId"), col("eventTime"), expr(
        """minhash_sig(array_distinct(transform(sequence(0, size(toks)-3),
          |  i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))))"""
          .stripMargin).as("sig"))
      .select(col("docId"), col("eventTime"), col("sig"),
        explode(array((0 until MinHashSig.NumHashes / 2).map(b =>
          concat_ws(":", lit(b),
            col("sig").getItem(2 * b), col("sig").getItem(2 * b + 1)))
          : _*)).as("bucket"))
      .as[Banded]
    banded
      .groupByKey(_.bucket)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(bucketFn(horizonMs, maxMembers))
  }
}
