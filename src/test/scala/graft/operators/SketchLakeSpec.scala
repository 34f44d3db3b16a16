package graft.operators

import java.nio.file.Files

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

case class SLEvent(ts: java.sql.Timestamp, event_type: String, user_id: Long)

/** Pins the claims q96 rides on: HLL partials survive a parquet
  * round-trip byte-stably (union over re-read partials estimates
  * EXACTLY what the in-plan union does), the rollup genuinely scans
  * the persisted partials (not the raw rows), appending a new day's
  * partials updates the rollup without touching history, and the
  * estimate respects the error contract against exact counts. */
class SketchLakeSpec extends AnyFunSuite {

  private def ts(day: Int) =
    java.sql.Timestamp.valueOf(f"2024-01-$day%02d 12:00:00")

  test("parquet round-trip is byte-stable; incremental append; bound holds") {
    val spark = SparkTestSession.spark
    import spark.implicits._

    // 3 types × 5 days, deliberate user overlap across days so the
    // union has real merging to do
    val rows = for {
      t <- Seq("click", "view", "buy"); day <- 1 to 5; u <- 0 until 50
    } yield (t, ts(day), (u * 3 + day * 7) % 80L)
    val e = rows.toDF("event_type", "ts", "user_id")

    val parts = SketchLake.partials(e, Seq("event_type"), "ts", "user_id")
    assert(parts.count() == 15, "one partial per (type, day)")

    val dir = Files.createTempDirectory("sketchlake").toString
    try {
      parts.write.mode("overwrite").parquet(dir)
      val persisted = spark.read.parquet(dir)

      // the rollup's plan must read the PERSISTED partials
      val rolled = SketchLake.rollup(persisted, Seq("event_type"))
      assert(rolled.queryExecution.executedPlan.toString.contains("parquet"),
        "rollup must scan the persisted partials")

      // byte-stable storage: disk union == in-plan union, exactly
      val inPlan = SketchLake.rollup(parts, Seq("event_type"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val disk = rolled
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(disk == inPlan,
        s"persisted-partials estimate must equal in-plan: $disk vs $inPlan")

      // estimator contract vs exact distincts
      val exact = e.groupBy(col("event_type"))
        .agg(countDistinct(col("user_id")).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      exact.foreach { case (t, n) =>
        assert(math.abs(disk(t) - n) <= 0.1 * n,
          s"$t: estimate ${disk(t)} too far from exact $n")
      }

      // incremental day: APPEND day-6 partials, rollup sees the union
      // of all days without rebuilding days 1-5
      val day6 = (0 until 50).map(u => ("click", ts(6), 200L + u))
        .toDF("event_type", "ts", "user_id")
      SketchLake.partials(day6, Seq("event_type"), "ts", "user_id")
        .write.mode("append").parquet(dir)
      val updated = SketchLake.rollup(spark.read.parquet(dir),
        Seq("event_type"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val exactClick = e.union(day6).filter(col("event_type") === "click")
        .select(col("user_id")).distinct().count()
      assert(math.abs(updated("click") - exactClick) <= 0.1 * exactClick,
        s"appended rollup ${updated("click")} vs exact $exactClick")
      assert(updated("view") == inPlan("view") &&
        updated("buy") == inPlan("buy"),
        "untouched types must be unaffected by the append")
    } finally {
      val root = new java.io.File(dir)
      Option(root.listFiles()).foreach(_.foreach(_.delete()))
      root.delete(); ()
    }
  }

  test("streaming partials: per-batch append; replayed batches cannot inflate") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    implicit val ctx = spark.sqlContext

    val dir = Files.createTempDirectory("sketchstream").toString
    val ck = Files.createTempDirectory("sketchstreamck").toString
    try {
      val in = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[SLEvent]
      val q = SketchLake.streamPartials(in.toDF(), Seq("event_type"), "ts",
          "user_id", dir)
        .option("checkpointLocation", ck)
        .start()
      in.addData((0 until 40).map(u => SLEvent(ts(1), "click", u.toLong)))
      q.processAllAvailable()
      in.addData((20 until 60).map(u => SLEvent(ts(2), "click", u.toLong)))
      q.processAllAvailable()
      q.stop()

      val stored = spark.read.parquet(dir)
      assert(stored.select("batch_id").distinct().count() == 2,
        "each micro-batch must have appended its own partials")
      val est = SketchLake.rollup(stored, Seq("event_type"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      // 60 distinct users across the two (overlapping) batches
      assert(math.abs(est("click") - 60) <= 6, s"estimate off: $est")

      // at-least-once replay: append batch 0's partials AGAIN — the
      // HLL union is idempotent, so the rollup must not move
      stored.filter(col("batch_id") === 0)
        .write.mode("append").parquet(dir)
      val replayed = SketchLake.rollup(spark.read.parquet(dir),
        Seq("event_type"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(replayed == est,
        s"replayed partials must not change any estimate: $replayed vs $est")
    } finally {
      for (d <- Seq(dir, ck)) {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
        }
        rm(new java.io.File(d))
      }
    }
  }
}
