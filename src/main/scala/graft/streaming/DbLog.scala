package graft.streaming

import scala.collection.mutable

import graft.cdc.Checkpoint
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** DBLog dump subsystem (A25-A28; reference pkg/dblog).
  *
  * Spark-first shape: the TID-range snapshot scan itself IS a
  * partitioned columnar scan — Spark's parquet/JDBC readers already
  * plan one InputPartition per row-group/page-range, so the engine does
  * not re-implement A26's ctid pagination; what it keeps from the
  * reference is the *semantics* around the scan:
  *
  *  - dump rows enter the feed as op=UPDATE with checkpoint
  *    (lsn=0, seq=dumpId) so the latest-wins merge treats them as
  *    older than any live change ([[graft.cdc.CdcApply.mergeSnapshot]],
  *    exercised by q47) — reference pkg/dblog/dumper.go:155-167;
  *  - an LSN staleness guard refuses a dump whose replica has not yet
  *    caught up to the client's observed position — dumper.go:172-186;
  *  - a driver-side work queue hands one dump range at a time per
  *    consumer with ack / exponential-backoff requeue —
  *    scheduler.go:26-126, 209-245.
  */
object DbLog {

  /** One dump unit: a page/row range of a table (A26's
    * DumpInfoResponse). */
  final case class DumpInfo(schema: String, table: String,
      pageBegin: Long, pageEnd: Long)

  /** Dump rows → change-feed rows with the (lsn=0, seq=dumpId)
    * convention (A27). */
  def dumpAsUpdates(dump: DataFrame, dumpId: Int): DataFrame =
    dump
      .withColumn("op", lit("UPDATE"))
      .withColumn("lsn", lit(0L))
      .withColumn("seq", lit(dumpId))

  /** One TID page range as a SQL predicate — the reference's DumpQuery
    * WHERE clause (pkg/dblog/dumper.go:112-122): PG ≥ 14 plans a TID
    * Range Scan for it, so partial scans touch only their blocks. The
    * upper bound uses offset 65535 (max offset number) rather than
    * `(end+1, 0)` for the same max-block edge case the reference
    * documents. */
  def ctidRangePredicate(pageBegin: Long, pageEnd: Long): String =
    s"ctid >= '($pageBegin,0)'::tid AND ctid <= '($pageEnd,65535)'::tid"

  /** Split `[0, maxPages)` into `(begin, endInclusive)` chunks of
    * `pagesPerChunk` — the reference dump planner's DumpInfo units. */
  def pageRanges(maxPages: Long, pagesPerChunk: Int): Seq[(Long, Long)] = {
    require(pagesPerChunk > 0, "pagesPerChunk must be positive")
    (0L until maxPages by pagesPerChunk.toLong)
      .map(b => (b, math.min(b + pagesPerChunk, maxPages) - 1))
  }

  /** DumpInfo units covering a table — feed these to the [[Scheduler]]
    * for the drip-fed per-client flow, or scan them all at once with
    * [[tidRangeScan]]. */
  def plan(schema: String, table: String, maxPages: Long,
      pagesPerChunk: Int): Seq[DumpInfo] =
    pageRanges(maxPages, pagesPerChunk)
      .map { case (b, e) => DumpInfo(schema, table, b, e) }

  /** TID-range partitioned snapshot scan (A26 proper, reference
    * PGXSourceDumper): ONE Spark input partition per page range,
    * executed as `spark.read.jdbc(url, table, predicates, …)` — Spark's
    * JDBC relation plans exactly one partition per predicate, which IS
    * the "DSv2 Batch with one InputPartition per ctid range" shape, with
    * pushdown, column pruning and the connection pool handled by the
    * built-in source rather than re-implemented.
    *
    * `predicateFor` defaults to [[ctidRangePredicate]] (PostgreSQL);
    * tests run the same plumbing against embedded Derby with a plain
    * column predicate. Compose with [[dumpAsUpdates]] +
    * [[graft.cdc.CdcApply.mergeSnapshot]] for the DBLog merge (q47). */
  def tidRangeScan(spark: org.apache.spark.sql.SparkSession, url: String,
      table: String, maxPages: Long, pagesPerChunk: Int,
      props: java.util.Properties,
      predicateFor: (Long, Long) => String = ctidRangePredicate): DataFrame = {
    val predicates = pageRanges(maxPages, pagesPerChunk)
      .map { case (b, e) => predicateFor(b, e) }.toArray
    spark.read.jdbc(url, table, predicates, props)
  }

  /** LSN staleness guard (A26): a replica may only serve a dump if its
    * applied watermark has reached the requester's observed LSN. */
  final case class LsnFallBehind(replica: Checkpoint, required: Checkpoint)
      extends RuntimeException(
        s"replica at ${replica.serialize} behind required ${required.serialize}")

  def requireFresh(replicaWatermark: Checkpoint, requiredLsn: Long): Unit = {
    val required = Checkpoint(requiredLsn, 0)
    if (java.lang.Long.compareUnsigned(replicaWatermark.lsn, requiredLsn) < 0)
      throw LsnFallBehind(replicaWatermark, required)
  }

  /** Driver-side dump scheduler (A28, reference MemoryScheduler):
    * per-URI pending queue, at most one outstanding dump per registered
    * client, ack advances, nack requeues with exponential backoff
    * 2·2ⁿ s capped at n=8 plus a configurable cool-down.
    */
  final class Scheduler(coolDownMs: Long = 0L,
      nowMs: () => Long = () => System.currentTimeMillis()) {

    private final case class Pending(info: DumpInfo, notBeforeMs: Long,
        retries: Int)
    private val queues = mutable.Map.empty[String, mutable.Queue[Pending]]
    private val outstanding = mutable.Map.empty[(String, String), Pending]

    /** Seed dumps for a source URI (A29's Schedule verb). */
    def schedule(uri: String, dumps: Seq[DumpInfo]): Unit = synchronized {
      val q = queues.getOrElseUpdate(uri, mutable.Queue.empty)
      dumps.foreach(d => q.enqueue(Pending(d, 0L, 0)))
    }

    /** Hand the next due dump to `client` — at most one in flight per
      * client; None while its previous dump is unacked or nothing due. */
    def poll(uri: String, client: String): Option[DumpInfo] = synchronized {
      if (outstanding.contains((uri, client))) return None
      val q = queues.getOrElse(uri, return None)
      val now = nowMs()
      val idx = q.indexWhere(_.notBeforeMs <= now)
      if (idx < 0) None
      else {
        val p = q.remove(idx)
        outstanding((uri, client)) = p
        Some(p.info)
      }
    }

    /** Ack: done (requeue=false) or failed (requeue=true → exponential
      * backoff 2·2ⁿ seconds, n capped at 8, plus cool-down). */
    def ack(uri: String, client: String, requeue: Boolean): Unit = synchronized {
      outstanding.remove((uri, client)).foreach { p =>
        if (requeue) {
          val n = math.min(p.retries, 8)
          val backoffMs = 2000L * (1L << n)
          queues.getOrElseUpdate(uri, mutable.Queue.empty)
            .enqueue(Pending(p.info, nowMs() + backoffMs + coolDownMs,
              p.retries + 1))
        }
      }
    }

    def pendingCount(uri: String): Int = synchronized {
      queues.get(uri).map(_.size).getOrElse(0)
    }

    /** Drain a URI's queue (A29's StopSchedule). */
    def stopSchedule(uri: String): Unit = synchronized {
      queues.remove(uri); ()
    }
  }
}
