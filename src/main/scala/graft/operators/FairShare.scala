package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Max-min fair (progressive waterfilling) allocation of an integer
  * budget across keyed demands, in closed form — no iteration.
  *
  * Keys whose demand fits under the waterline keep their FULL demand;
  * the rest share the remaining budget equally (±1 from the integer
  * remainder, spread deterministically over the first capped ranks in
  * (demand, key) order) so that `Σ alloc == budget` EXACTLY whenever
  * `budget ≤ Σ demand`, and `alloc == demand` everywhere otherwise.
  *
  * Shape: ranks come from ONE sorted prefix-sum window over the
  * demand rows (O(groups) post-aggregation — never corpus-sized); the
  * first rank whose demand exceeds its hypothetical equal share of
  * the remaining budget IS the waterline. All arithmetic is integer,
  * so every engine and partitioning derives the identical allocation.
  * Exercised end-to-end by q169 (DuckDB oracle) and adversarially by
  * FairSharePropertySpec against an independent fold.
  */
object FairShare {

  /** @param demands  (key: string, d: long ≥ 0) — one row per key
    * @param budgetNum/budgetDen  budget = (budgetNum · Σd) div budgetDen
    * @return (key, demand, alloc, capped) ordered by key */
  def allocate(demands: DataFrame, budgetNum: Long,
      budgetDen: Long): DataFrame = {
    val tot = demands.agg(
      expr(s"($budgetNum * sum(d)) div $budgetDen").cast("long").as("b"),
      count(lit(1)).as("n"))
    val wOrd = Window.orderBy(col("d"), col("key"))
    val sh = demands
      .withColumn("i", row_number().over(wOrd).cast("long"))
      .withColumn("p", sum(col("d")).over(
        wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("long"))
      .crossJoin(broadcast(tot))
      .withColumn("rem", col("b") - (col("p") - col("d")))
      .withColumn("share", expr("rem div (n - i + 1)"))
    val cv = sh.filter(col("share") < col("d"))
      .agg(min(col("i")).as("crit"))
      .join(sh, col("crit") === col("i"))
      .select(col("share").as("lam"),
        (col("rem") - col("share") * (col("n") - col("i") + 1)).as("r"),
        col("i").as("ci"))
    sh.join(broadcast(cv), lit(true), "left")
      .select(col("key"), col("d").as("demand"),
        when(col("ci").isNull || col("i") < col("ci"), col("d"))
          .otherwise(col("lam") +
            when(col("i") - col("ci") < col("r"), 1L).otherwise(0L))
          .cast("long").as("alloc"))
      // capped means the key actually LOST something (alloc < demand)
      // — a waterline-rank key whose +1 remainder restores its full
      // demand was not downsampled and must not be reported as such
      .withColumn("capped",
        when(col("alloc") < col("demand"), 1L).otherwise(0L))
      .orderBy(col("key"))
  }
}
