package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-iteration PageRank in EXACT INTEGER arithmetic: ranks live in
  * [[Scale]]-unit fixed point, per-edge contributions are `r div deg`,
  * and the damping step is `(15·S) div 100 + (85·Σ) div 100`. Integer
  * sums are associative, so any shuffle order, partitioning, or engine
  * computes IDENTICAL ranks — float PageRank cannot be cross-engine
  * oracle-checked; this can, bit for bit (q137's green hash).
  *
  * Each iteration is one edge-keyed join + one dst-keyed aggregate —
  * the Pregel shape. The degree-annotated adjacency is materialized
  * ONCE (`localCheckpoint`) — without it, the unrolled plan
  * re-expands the whole edge-building pipeline per round (q272's plan
  * carried 42 scans / 104 exchanges for 4 rounds). Ranks are exact
  * integers, so materialization cannot change them. The per-round
  * rank table is NOT checkpointed: unlike [[ConnectedComponents]]
  * (whose round output feeds two star joins plus a convergence
  * action), a rank round has exactly ONE consumer — the next round —
  * so an eager per-round cut bought no reuse, only an extra job plus
  * block-manager ser/de per round (q137 measurably slower, r16
  * verdict #4), and the unrolled depth is a fixed ≤5 rounds over the
  * checkpointed adjacency, whose one exchange the planner reuses
  * across rounds.
  */
object PageRank {

  final val Scale = 1000000000000L

  /** `iters` rounds over undirected `edges` (columns x, y; distinct).
    * Returns (u, r) — every node's fixed-point rank. No dangling-mass
    * term: every node of an undirected edge list has outdegree ≥ 1. */
  def ranks(edges: DataFrame, iters: Int): DataFrame = {
    val dirE = edges.select(col("x").as("src"), col("y").as("dst"))
      .unionAll(edges.select(col("y").as("src"), col("x").as("dst")))
      .localCheckpoint() // the edge pipeline runs once, not per round
    val deg = dirE.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    val withDeg = dirE.join(deg, "src")
      .localCheckpoint() // O(edges): joined by every round
    var r = deg.select(col("src").as("u"), lit(Scale).as("r"))
    for (_ <- 1 to iters) {
      r = withDeg.join(r, col("src") === col("u"))
        .select(col("dst"), expr("r div deg").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("sc"))
        .select(col("dst").as("u"),
          expr(s"(15 * ${Scale}L) div 100 + (85 * sc) div 100").as("r"))
    }
    r
  }

  /** Personalized PageRank: the teleport mass lands on `seeds`
    * (column u) instead of uniformly — the random-walk-with-restart
    * similarity that powers "users like these" recommendations. Same
    * exact-integer discipline as [[ranks]]: the per-seed teleport is
    * `(15·Scale) div (100·|S|)` with |S| counted AFTER restricting
    * seeds to graph nodes (off-graph seeds would silently strand
    * mass), r₀ IS the teleport vector, and each round adds the
    * damped integer contribution sum. One O(nodes) teleport table is
    * checkpointed once and joined per round — never a driver-side
    * seed list. A seedless graph converges to all-zero ranks (the
    * CASE guard means the |S| division never executes on any row). */
  def personalized(edges: DataFrame, seeds: DataFrame,
      iters: Int): DataFrame = {
    val dirE = edges.select(col("x").as("src"), col("y").as("dst"))
      .unionAll(edges.select(col("y").as("src"), col("x").as("dst")))
      .localCheckpoint() // the edge pipeline runs once, not per round
    val deg = dirE.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    val withDeg = dirE.join(deg, "src")
      .localCheckpoint() // O(edges): joined by every round
    val inGraph = seeds.select(col("u"))
      .join(deg.select(col("src").as("u")), "u")
    val ns = inGraph.agg(count(lit(1)).as("ns"))
    val tel = deg.select(col("src").as("u"))
      .join(inGraph.withColumn("isSeed", lit(1)), Seq("u"), "left")
      .crossJoin(broadcast(ns))
      .select(col("u"),
        when(col("isSeed").isNotNull,
          expr(s"(15 * ${Scale}L) div (100 * ns)"))
          .otherwise(lit(0L)).as("tel"))
      .localCheckpoint()
    var r = tel.select(col("u"), col("tel").as("r"))
    for (_ <- 1 to iters) {
      r = withDeg.join(r, col("src") === col("u"))
        .select(col("dst"), expr("r div deg").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("sc"))
        .select(col("dst").as("u"), expr("(85 * sc) div 100").as("pr"))
        .join(tel, "u")
        .select(col("u"), (col("tel") + col("pr")).as("r"))
    }
    r
  }
}
