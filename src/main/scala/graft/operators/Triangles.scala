package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Degree-ordered triangle counting over an undirected edge list —
  * the graph-analytics primitive for co-occurrence graphs (user×user,
  * domain×domain) a curation pipeline builds from activity feeds.
  *
  * Algorithm (the node-iterator++ / forward algorithm): orient every
  * edge from its lower-(degree, id) endpoint to the higher one, form
  * wedges only at each vertex's out-neighbors, and close them against
  * the oriented edge list. Orientation bounds every vertex's
  * out-degree by O(√m) on any graph (arboricity argument), so the
  * wedge fan-out — the only super-linear term — is O(m^1.5) worst
  * case instead of Σ deg² on the raw star shapes real co-occurrence
  * graphs have. All three legs are plain equi-joins on the edge
  * relation: Catalyst shuffles on the join keys, AQE handles skew,
  * nothing is collected.
  */
object Triangles {

  /** One-row stats over `edges` (columns `x < y`, distinct):
    * n_edges, n_wedges (Σ d(d−1)/2), n_triangles, global_cc
    * (= 3·triangles / wedges, 6-dp). */
  def stats(edges: DataFrame): DataFrame = {
    val deg = edges.select(col("x").as("u"))
      .unionAll(edges.select(col("y").as("u")))
      .groupBy(col("u")).agg(count(lit(1)).as("dg"))
    // total order for orientation: (degree, id) packed into one long
    // (degree < 2^31, ids non-negative < 2^32 here; callers with
    // wider ids orient on a struct instead)
    val keyed = deg.select(col("u"),
      (col("dg") * lit(4294967296L) + col("u")).as("k"))
    val o = edges
      .join(keyed.select(col("u").as("x"), col("k").as("kx")), "x")
      .join(keyed.select(col("u").as("y"), col("k").as("ky")), "y")
      .select(
        when(col("kx") < col("ky"), col("x")).otherwise(col("y")).as("src"),
        when(col("kx") < col("ky"), col("y")).otherwise(col("x")).as("dst"),
        greatest(col("kx"), col("ky")).as("kd"))
    // Adjacency-intersection count: each triangle {u<v<w in key
    // order} is found ONCE, at its base edge (u,v), as w ∈
    // N⁺(u) ∩ N⁺(v) — via the sorted_overlap merge kernel over the
    // per-node sorted out-neighbor arrays. This replaces the wedge
    // materialization (Σ d⁺(d⁺−1)/2 rows shuffled into a pair join —
    // an order of magnitude more exchange volume than the edge list
    // on a dense graph); here the only shuffled payloads are the
    // oriented edges and one adjacency array per node, and the
    // intersection itself is row-local codegen.
    graft.functions.GraftFunctions.register(edges.sparkSession)
    val adj = o.groupBy(col("src"))
      .agg(sort_array(collect_set(col("dst"))).as("ns"))
    val nTri = o.select(col("src"), col("dst"))
      .join(adj.select(col("src"), col("ns").as("nsu")), "src")
      .join(adj.select(col("src").as("dst"), col("ns").as("nsv")), "dst")
      .agg(coalesce(sum(expr("sorted_overlap(nsu, nsv)")), lit(0L))
        .cast("long").as("n_triangles"))
    val nWedge = deg.agg(sum(expr("(dg * (dg - 1)) div 2")).as("n_wedges"))
    val nEdge = edges.agg(count(lit(1)).as("n_edges"))
    nEdge.crossJoin(broadcast(nWedge)).crossJoin(broadcast(nTri))
      .select(col("n_edges"), col("n_wedges"), col("n_triangles"),
        // ANSI errors on double division by zero: a wedge-free graph
        // has no defined clustering coefficient — emit null
        when(col("n_wedges") > 0,
          round(lit(3.0) * col("n_triangles") / col("n_wedges"), 6))
          .as("global_cc"))
  }

  /** Per-node triangle counts `(node, tri)` — the local variant
    * [[stats]] aggregates away. Same degree-ordered orientation, but
    * each triangle must credit all THREE corners, so the closing step
    * materializes the intersection ELEMENTS (`array_intersect` on the
    * sorted out-neighbor arrays, row-local) instead of summing
    * overlap counts: one output row per triangle (found once, at its
    * base edge), then a corner-explode + count. Exchange volume is
    * the oriented edge list + one adjacency array per node + one row
    * per triangle — the same O(m^1.5) bound as [[stats]]. Nodes in no
    * triangle are absent (callers left-join degrees). */
  def perNode(edges: DataFrame): DataFrame = {
    val deg = edges.select(col("x").as("u"))
      .unionAll(edges.select(col("y").as("u")))
      .groupBy(col("u")).agg(count(lit(1)).as("dg"))
    val keyed = deg.select(col("u"),
      (col("dg") * lit(4294967296L) + col("u")).as("k"))
    val o = edges
      .join(keyed.select(col("u").as("x"), col("k").as("kx")), "x")
      .join(keyed.select(col("u").as("y"), col("k").as("ky")), "y")
      .select(
        when(col("kx") < col("ky"), col("x")).otherwise(col("y")).as("src"),
        when(col("kx") < col("ky"), col("y")).otherwise(col("x")).as("dst"))
      // the oriented edge list and adjacency arrays each feed two+
      // consumers below — truncate the lineage once (edge-list-sized)
      // instead of replaying the orientation joins per consumer
      .localCheckpoint()
    val adj = o.groupBy(col("src"))
      .agg(sort_array(collect_set(col("dst"))).as("ns"))
      .localCheckpoint()
    val tris = o
      .join(adj.select(col("src"), col("ns").as("nsu")), "src")
      .join(adj.select(col("src").as("dst"), col("ns").as("nsv")), "dst")
      .select(col("src"), col("dst"),
        explode(array_intersect(col("nsu"), col("nsv"))).as("w"))
    tris.select(col("src").as("node"))
      .unionAll(tris.select(col("dst").as("node")))
      .unionAll(tris.select(col("w").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("tri"))
  }
}
