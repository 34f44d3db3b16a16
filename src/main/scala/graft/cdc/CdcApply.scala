package graft.cdc

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Declarative re-expression of the reference's apply-side semantics
  * (pgcapture pkg/sink/postgres.go:395-593): a change feed keyed by
  * primary key, totally ordered by checkpoint `(lsn, seq)`, collapses
  * to "latest row wins; DELETE removes".
  *
  * Instead of replaying row-at-a-time SQL like the reference's Go sink,
  * the Spark engine states the outcome as a window/agg plan and lets
  * Catalyst pick the physical strategy (hash shuffle on the key, one
  * pass, whole-stage codegen). At 100 TB the shuffle is on the primary
  * key only and AQE handles skewed keys.
  */
object CdcApply {

  /** Latest row per key by `(orderCols)` descending — the as-of
    * snapshot view. Ties are impossible when orderCols end in the
    * checkpoint `(lsn, seq)` pair, which is unique per change.
    */
  def latestSnapshot(changes: DataFrame, keyCols: Seq[String],
      orderCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(orderCols.map(c => col(c).desc): _*)
    changes.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Full materialization: latest-wins then drop rows whose final op is
    * DELETE (reference A19) — the queryable replica table.
    */
  def materialize(changes: DataFrame, keyCols: Seq[String],
      orderCols: Seq[String], opCol: String = "op"): DataFrame =
    latestSnapshot(changes, keyCols, orderCols)
      .filter(col(opCol) =!= CdcOp.Delete)

  /** Merge a base snapshot with a batch of newer changes: the DBLog
    * stream∪dump union (reference A25/A27, pkg/dblog/gateway.go:113-217).
    * Dump rows ride in as op=UPDATE with lsn=0; the reference treats
    * them as "newest" for unseen keys but never overrides a live change
    * — expressed here by unioning and letting the (lsn,seq) order
    * decide, with live rows sorting after dump rows of the same key.
    */
  def mergeSnapshot(base: DataFrame, changes: DataFrame, keyCols: Seq[String],
      orderCols: Seq[String], opCol: String = "op"): DataFrame =
    materialize(base.unionByName(changes), keyCols, orderCols, opCol)

  /** Idempotent-resume filter (reference A12, pkg/sink/pulsar.go:116-127):
    * drop changes at or before the high-watermark checkpoint. LSNs are
    * unsigned 64-bit (reference pkg/cursor/main.go:13-48, and
    * [[Checkpoint.compare]]); XOR with Long.MinValue maps unsigned order
    * onto signed so the comparison stays a codegen'd column expression.
    */
  def afterCheckpoint(changes: DataFrame, watermark: Checkpoint,
      lsnCol: String = "lsn", seqCol: String = "seq"): DataFrame = {
    val flip = lit(Long.MinValue)
    val lsnU = col(lsnCol).bitwiseXOR(flip)
    val wmU = lit(watermark.lsn ^ Long.MinValue)
    changes.filter(
      lsnU > wmU || (lsnU === wmU && col(seqCol) > lit(watermark.seq)))
  }

  /** Table-regex routing (reference A23, pkg/dblog/gateway.go:159-173). */
  def routeTables(changes: DataFrame, regex: String,
      tableCol: String = "table"): DataFrame =
    changes.filter(col(tableCol).rlike(regex))

  /** Checkpoint total-order as sortable columns for `orderBy` use —
    * the SAME unsigned-lsn order as [[Checkpoint.compare]] and
    * [[afterCheckpoint]] (XOR with Long.MinValue maps unsigned onto
    * signed); a plain signed `col(lsn)` would invert the order for
    * LSNs past 2⁶³. */
  def checkpointOrder(lsnCol: String = "lsn", seqCol: String = "seq"): Seq[Column] =
    Seq(col(lsnCol).bitwiseXOR(lit(Long.MinValue)), col(seqCol))
}
