package graft.streaming

import org.apache.spark.sql.SparkSession

/** State-store sizing for the streaming operators ([[StreamDedup]],
  * [[StreamNearDup]], [[StreamHeavyHitters]], [[Debounce]]).
  *
  * Spark pins a streaming query's state-store partition count to
  * `spark.sql.shuffle.partitions` AS OF THE QUERY'S FIRST START and
  * records it in the checkpoint — it cannot change across restarts.
  * That width is right for batch shuffles but wrong for small-state
  * operators: a CMS sketch (≤ 1024 rows) or a modest dedup horizon
  * spread over a 200-partition production default pays 200 state-store
  * commits per trigger for rows that would fit in a handful.
  *
  * A per-operator `statePartitions` parameter CANNOT honor that knob:
  * a `repartition(n, key)` below a stateful operator is re-shuffled by
  * `EnsureRequirements` to the conf width anyway (stateful operators
  * demand a `StatefulOpClusteredDistribution` with exactly the
  * session's width), and the only conf that overrides it
  * (`spark.sql.streaming.internal.stateStore.partitions`) is marked
  * internal/do-not-use. So the supported contract is the session conf
  * at start time — which this helper scopes: wrap the
  * `writeStream.start()` (and, for a bounded drain, the
  * `processAllAvailable`) in `withStatePartitions`; batch stages
  * planned after the block resume the session width.
  *
  * {{{
  * val q = StreamRun.withStatePartitions(spark, 8) {
  *   StreamDedup.byContent(stream, "ts", "30 days")
  *     .writeStream.option("checkpointLocation", dir).start()
  * }
  * }}}
  */
object StreamRun {

  /** Run `body` (a streaming start, or start → drain → stop) with
    * `spark.sql.shuffle.partitions` temporarily set to `n`, restoring
    * the previous value afterwards. Because the state-store width is
    * captured at first start and persisted in the checkpoint, the
    * narrower layout binds only queries STARTED inside the block. */
  def withStatePartitions[T](spark: SparkSession, n: Int)(body: => T): T = {
    require(n > 0, s"statePartitions must be positive, got $n")
    val key = "spark.sql.shuffle.partitions"
    val prev = spark.conf.get(key)
    spark.conf.set(key, n.toString)
    try body finally spark.conf.set(key, prev)
  }
}
