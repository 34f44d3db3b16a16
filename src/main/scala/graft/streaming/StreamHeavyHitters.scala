package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Streaming count-min sketch — bounded-state frequency tracking over
  * an unbounded token stream (the streaming leg of q72's batch CMS;
  * reference capability class: continuous relational maintenance,
  * SURVEY §2 Part B "stateful aggregations").
  *
  * The whole point of CMS on a stream: the state is the SKETCH, not
  * the vocabulary. `cells` maps every token map-side onto
  * `Depth × Width` (row, bucket) cells; the streaming aggregate then
  * keys on the cell id, so state-store rows are capped at
  * `Depth · Width` (1024) no matter how many distinct tokens flow
  * through — a trending-terms tracker whose RocksDB footprint is a
  * constant. Estimates are point lookups:
  * est(t) = min over d of cell(d, bucket(d, t)), always ≥ the true
  * count (the CMS guarantee).
  *
  * The cell hash is EXACTLY q72's (`Sketches.hash60(d ':' token) %
  * Width`), so a sketch folded incrementally from micro-batches is
  * bit-identical to the batch-built sketch over the same data —
  * StreamHeavyHittersSpec asserts cell-level equality, the same
  * streaming ≡ batch contract StreamNearDup pins for MinHash.
  *
  * State-store sizing: ≤ Depth·Width state rows never need the
  * session's batch shuffle width — wrap the query START in
  * [[StreamRun.withStatePartitions]] (see that object's scaladoc for
  * why this cannot be a parameter here).
  */
object StreamHeavyHitters {

  val Depth = 4
  val Width = 256

  /** Map-side cell expansion: each token row becomes `Depth`
    * (d, bucket) rows. Works on a streaming or batch DataFrame. */
  def cells(tokens: DataFrame, tokenCol: String = "tk"): DataFrame =
    tokens
      .select(col(tokenCol).as("tk"),
        explode(sequence(lit(0), lit(Depth - 1))).as("d"))
      .select(col("d"), bucketOf(col("d"), col("tk")).as("bucket"))

  /** The q72 cell hash: bucket(d, token). */
  def bucketOf(d: Column, tok: Column): Column =
    graft.queries.Sketches.hash60(
      concat(d.cast("string"), lit(":"), tok)) % Width

  /** Streaming sketch build: groupBy cell id, running count. Attach
    * to `writeStream` in Update/Complete mode; state rows ≤
    * Depth·Width forever. */
  def sketch(tokens: DataFrame, tokenCol: String = "tk"): DataFrame =
    cells(tokens, tokenCol)
      .groupBy(col("d"), col("bucket"))
      .agg(count(lit(1)).as("cnt"))

  /** Point estimates for `probes` (a small batch DataFrame with a
    * `tk` column) against a materialized sketch (the streaming
    * query's in-progress or final state): min over depths of the
    * probed cells. LEFT join + coalesce(0): a sketch only stores
    * touched cells, so an untouched cell reads as the zero cell a
    * dense CMS would hold — an unseen token estimates 0 (and a token
    * with SOME untouched cells takes the honest min over all Depth
    * cells, not an inflated min over the touched subset). */
  def estimate(sketchCells: DataFrame, probes: DataFrame,
      tokenCol: String = "tk"): DataFrame =
    probes
      .select(col(tokenCol).as("tk"),
        explode(sequence(lit(0), lit(Depth - 1))).as("d"))
      .withColumn("bucket", bucketOf(col("d"), col("tk")))
      .join(sketchCells, Seq("d", "bucket"), "left")
      .groupBy(col("tk"))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
}
