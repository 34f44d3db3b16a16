package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Loaders for the driver-generated TPC-H-ish corpus (TESTDATA.md).
  *
  * One parquet file per table under the given sf directory. All query
  * entry points take `(spark, sfDir)` so the same code runs at any
  * scale factor — and, on a real cluster, against a 100 TB lake by
  * pointing `sfDir` at the lake root.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    // events.ts is TIMESTAMP(NANOS) parquet, which Spark only reads as
    // a long (spark.sql.legacy.parquet.nanosAsLong, set in Verify/Bench
    // sessions). The values are µs-precision, so ns→µs is lossless and
    // matches DuckDB's TIMESTAMP_NS → TIMESTAMP cast.
    df.schema.find(f => f.name == "ts" && f.dataType == LongType) match {
      case Some(_) => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case None => df
    }
  }

  /** Fan a (small-file, compute-heavy) scan out to full parallelism.
    * Small parquet inputs arrive as 1-2 input partitions (row-group
    * granularity), which serializes CPU-bound projections like
    * tokenization or wire encoding onto one core; a round-robin
    * rebalance of the raw rows is cheap relative to that compute. On a
    * real lake the scan is already wide and AQE coalesces the extra
    * exchange away.
    */
  def wide(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= target) df else df.repartition(target)
  }

  /** Register all tables as temp views for spark.sql entry points. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))

  /** Session tuned for the local[32] harness but with settings that
    * carry to a multi-executor cluster (AQE, skew handling, broadcast
    * threshold). Shuffle partitions match local cores per the harness
    * contract; on a real cluster this would be set to ~2-3x cores or
    * left to AQE coalescing.
    */
  def session(appName: String, cpus: String): SparkSession =
    SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
}
