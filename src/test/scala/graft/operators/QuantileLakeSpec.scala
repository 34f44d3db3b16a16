package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the properties q102 rides on: the bottom-k sample is a
  * deterministic SEMILATTICE (rolling up per-day partials yields
  * exactly the sample a single flat bottom-k over all rows yields,
  * regardless of partitioning), merge dedups so replayed at-least-once
  * partial appends cannot bias the sample, and a group that fits in k
  * is sampled whole — its "estimates" are the exact order statistics. */
class QuantileLakeSpec extends AnyFunSuite {

  private val probes = Seq("p50" -> 0.5, "p95" -> 0.95)

  private def day(i: Int) = f"2024-02-${i % 28 + 1}%02d 08:00:00"

  test("rollup over daily partials == flat bottom-k; partitioning-independent") {
    val spark = SparkTestSession.spark
    import spark.implicits._

    // 3000 rows over 28 days, k=256 < group size so sampling is real
    val rows = (0 until 3000).map(i =>
      ("g", java.sql.Timestamp.valueOf(day(i)), i.toLong, (i * 37 % 997).toDouble))
    val df = rows.toDF("key", "ts", "id", "v")

    def estimates(in: org.apache.spark.sql.DataFrame, numParts: Int) =
      QuantileLake.rollup(
        QuantileLake.partials(in.repartition(numParts), Seq("key"), "ts",
          "v", Seq("id"), k = 256),
        Seq("key"), probes, k = 256).collect().head

    // flat = one "day": same rows, single partition grain
    val flat = QuantileLake.rollup(
      QuantileLake.partials(
        df.withColumn("ts", lit(java.sql.Timestamp.valueOf(day(0)))),
        Seq("key"), "ts", "v", Seq("id"), k = 256),
      Seq("key"), probes, k = 256).collect().head

    val daily = estimates(df, 32)
    assert(daily.getLong(1) == 256 && flat.getLong(1) == 256)
    assert(daily.getDouble(2) == flat.getDouble(2), "p50 semilattice")
    assert(daily.getDouble(3) == flat.getDouble(3), "p95 semilattice")
    assert(estimates(df, 5) == daily, "partitioning must not matter")
  }

  test("replayed partial appends (at-least-once) do not move the rollup") {
    val spark = SparkTestSession.spark
    import spark.implicits._

    val df = (0 until 500).map(i =>
      ("g", java.sql.Timestamp.valueOf(day(i)), i.toLong, math.sin(i) * 100))
      .toDF("key", "ts", "id", "v")
    val parts = QuantileLake.partials(df, Seq("key"), "ts", "v",
      Seq("id"), k = 64)
    val once = QuantileLake.rollup(parts, Seq("key"), probes, k = 64).collect()
    val replayed = QuantileLake.rollup(
      parts.union(parts.limit(3)), Seq("key"), probes, k = 64).collect()
    assert(once.sameElements(replayed))
  }

  test("streaming partials: batches merge exactly; replayed batch is a no-op") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    implicit val ctx = spark.sqlContext

    val dir = java.nio.file.Files.createTempDirectory("qlakestream").toString
    val ck = java.nio.file.Files.createTempDirectory("qlakestreamck").toString
    def rmAll(): Unit = for (d <- Seq(dir, ck)) {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(new java.io.File(d))
    }
    try {
      val in = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(String, java.sql.Timestamp, Long, Double)]
      val q = QuantileLake.streamPartials(
          in.toDF().toDF("key", "ts", "id", "v"),
          Seq("key"), "ts", "v", Seq("id"), dir, k = 128)
        .option("checkpointLocation", ck)
        .start()
      // two batches, overlapping DAYS but disjoint ids (the streaming
      // append shape); 600 rows > k so sampling is real
      val all = (0 until 600).map(i =>
        ("g", java.sql.Timestamp.valueOf(day(i)), i.toLong, (i * 31 % 503).toDouble))
      in.addData(all.take(300)); q.processAllAvailable()
      in.addData(all.drop(300)); q.processAllAvailable()
      q.stop()

      val stored = spark.read.parquet(dir)
      assert(stored.select("batch_id").distinct().count() == 2)
      val streamed = QuantileLake.rollup(stored, Seq("key"), probes,
        k = 128).collect()
      // semilattice: streamed partials == one flat batch build, exactly
      val flat = QuantileLake.rollup(
        QuantileLake.partials(all.toDF("key", "ts", "id", "v"),
          Seq("key"), "ts", "v", Seq("id"), k = 128),
        Seq("key"), probes, k = 128).collect()
      assert(streamed.sameElements(flat),
        s"streamed rollup must equal flat build: ${streamed.toSeq} vs ${flat.toSeq}")

      // at-least-once replay: re-append batch 0's (bit-identical)
      // partials — the whole-row dedup must make it a no-op
      stored.filter(col("batch_id") === 0).write.mode("append").parquet(dir)
      val replayed = QuantileLake.rollup(spark.read.parquet(dir),
        Seq("key"), probes, k = 128).collect()
      assert(replayed.sameElements(streamed))
    } finally rmAll()
  }

  test("group within k is sampled whole: exact order statistics") {
    val spark = SparkTestSession.spark
    import spark.implicits._

    val vals = Seq(9.0, 1.0, 7.0, 3.0, 5.0, 2.0, 8.0, 4.0, 6.0, 10.0)
    val df = vals.zipWithIndex.map { case (v, i) =>
      ("g", java.sql.Timestamp.valueOf(day(i)), i.toLong, v)
    }.toDF("key", "ts", "id", "v")
    val out = QuantileLake.rollup(
      QuantileLake.partials(df, Seq("key"), "ts", "v", Seq("id"), k = 64),
      Seq("key"), Seq("p30" -> 0.3, "p50" -> 0.5, "p100" -> 1.0),
      k = 64).collect().head
    assert(out.getLong(1) == 10, "whole group retained")
    assert(out.getDouble(2) == 3.0, "p30 = ceil(0.3*10)=3rd order stat")
    assert(out.getDouble(3) == 5.0, "p50 = 5th order stat")
    assert(out.getDouble(4) == 10.0, "p100 = max")
  }
}
