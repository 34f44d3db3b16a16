package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-iteration SYNCHRONOUS label propagation (community
  * detection) over an undirected edge list, made fully deterministic:
  * every node starts as its own label, each round every node adopts
  * the most frequent label among its neighbors with ties broken by
  * the SMALLEST label — so any partitioning, shuffle order, or engine
  * replays the identical label sequence (classic async LPA is
  * update-order-dependent and unreproducible; synchronous + total
  * tie-break is the q137/q186 integer-graph discipline applied to
  * community detection).
  *
  * Each round is one neighbor-keyed join + a (v, lab) count + a
  * v-keyed integer argmax — the Pregel shape, all map-side-combining
  * aggregates, no window sort (the argmax is `max(struct(cnt, -lab))`
  * so the per-node top-1 combines partially instead of sorting each
  * partition). Per-round `localCheckpoint` keeps the visible plan
  * O(1) deep ([[Hits]]' lineage discipline). State is O(nodes) rows
  * per round; nothing is ever collected.
  */
object LabelPropagation {

  /** `iters` synchronous rounds over undirected `edges` (columns
    * x, y; one row per edge). Returns (v, lab) — every endpoint's
    * community label after the final round. */
  def labels(edges: DataFrame, iters: Int): DataFrame = {
    val sym = edges.select(col("x").as("v"), col("y").as("n"))
      .unionAll(edges.select(col("y").as("v"), col("x").as("n")))
      .localCheckpoint()
    var lab = sym.select(col("v")).distinct()
      .select(col("v"), col("v").as("lab"))
      .localCheckpoint()
    for (_ <- 1 to iters) {
      lab = sym.join(lab.withColumnRenamed("v", "n"), "n")
        .groupBy(col("v"), col("lab")).agg(count(lit(1)).as("cnt"))
        .groupBy(col("v"))
        .agg(max(struct(col("cnt"), (-col("lab")).as("nl"))).as("m"))
        .select(col("v"), (-col("m.nl")).as("lab"))
        .localCheckpoint()
    }
    lab
  }
}
