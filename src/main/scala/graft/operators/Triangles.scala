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
    val wedges = o.as("e1").join(o.as("e2"),
        col("e1.src") === col("e2.src") && col("e1.kd") < col("e2.kd"))
      .select(col("e1.dst").as("b"), col("e2.dst").as("c"))
    val nTri = wedges
      .join(o.select(col("src").as("b"), col("dst").as("c")), Seq("b", "c"))
      .agg(count(lit(1)).as("n_triangles"))
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
}
