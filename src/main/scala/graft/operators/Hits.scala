package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-iteration HITS (Kleinberg hubs & authorities) in EXACT
  * INTEGER arithmetic over a directed bipartite edge list: scores live
  * in [[PageRank.Scale]]-unit fixed point and each half-iteration
  * rescales by the current maximum with integer division — so any
  * shuffle order, partitioning, or engine computes IDENTICAL scores
  * (float HITS normalizes by an L2 norm whose summation order is not
  * reproducible cross-engine; max-rescaled integer HITS is, bit for
  * bit — the q137 PageRank discipline applied to the two-sided
  * update).
  *
  * Each half-iteration is one edge-keyed join + one node-keyed
  * aggregate (the Pregel shape) plus a 1-row max aggregate that rides
  * a broadcast — never a driver collect. Sums run in DECIMAL(38,0):
  * a node of degree d accumulates up to d·Scale, which overflows long
  * at the 1e8 degrees a 100 TB graph can hold.
  *
  * Unlike [[PageRank]] (one consumer per round → linear plan growth),
  * the max-rescale makes every round's aggregate feed TWO consumers
  * (the max and the rescale), so an unchecked lineage doubles per
  * half-iteration — 3 rounds measured 378 shuffle exchanges, each a
  * re-execution at scale. The per-round `localCheckpoint` on the
  * O(nodes) aggregate is therefore load-bearing ([[ConnectedComponents]]'
  * discipline): each round's join runs exactly once and the visible
  * plan stays O(1) deep.
  */
object Hits {

  /** `iters` rounds over directed `edges` (columns s → p, distinct).
    * Returns (hubs, auths): (s, h) and (p, a) fixed-point scores. */
  def scores(edges: DataFrame, iters: Int): (DataFrame, DataFrame) = {
    val S = PageRank.Scale
    var h = edges.select(col("s")).distinct().withColumn("h", lit(S))
    var a: DataFrame = h.sparkSession.emptyDataFrame
    for (_ <- 1 to iters) {
      val ar = edges.join(h, "s")
        .groupBy(col("p")).agg(sum(col("h").cast("decimal(38,0)")).as("ar"))
        .localCheckpoint()
      val am = ar.agg(max(col("ar")).as("m"))
      a = ar.crossJoin(broadcast(am))
        .select(col("p"), expr(s"CAST((ar * ${S}L) div m AS BIGINT)").as("a"))
      val hr = edges.join(a, "p")
        .groupBy(col("s")).agg(sum(col("a").cast("decimal(38,0)")).as("hr"))
        .localCheckpoint()
      val hm = hr.agg(max(col("hr")).as("m"))
      h = hr.crossJoin(broadcast(hm))
        .select(col("s"), expr(s"CAST((hr * ${S}L) div m AS BIGINT)").as("h"))
    }
    (h, a)
  }
}
