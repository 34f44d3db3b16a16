package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{CodecQueries, LakeOps, PartB, QueryDef, Relational, Sketches, TextOps, TrainingOps, VectorOps}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the operator inventory of SURVEY.md §2 Part B plus the
  * training-data-pipeline extensions; each SQL-expressible entry has a
  * DuckDB oracle in `oracleSql` (column names/types aligned — the
  * driver hash-compares after sorting columns by name).
  */
object SparkEntry {

  val allQueries: Seq[QueryDef] =
    Relational.queries ++ TextOps.queries ++ Sketches.queries ++
      VectorOps.queries ++ CodecQueries.queries ++ PartB.queries ++
      TrainingOps.queries ++ LakeOps.queries

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q01_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allQueries.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allQueries.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
