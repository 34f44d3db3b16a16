package graft.streaming

import java.nio.file.Files

import graft.SparkTestSession
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Mid-feed stop/restart for the stateful streaming operators: the
  * oracle queries (q92–q94, q97, q124, q132, q138) drain their feeds
  * in ONE run, so checkpoint resume is exercised only by the applier's
  * crash spec and q138's kill-and-replay spec. This suite promotes the
  * restart story to the other stateful shapes: a query is stopped
  * after consuming HALF its feed, more files land while it is down,
  * and the restarted query (same checkpoint) must produce exactly the
  * batch answer over the whole feed — state (open sessions, seen
  * hashes) survives the restart, and the restart-safe sink discipline
  * (per-batch partition overwrite, the q138 pattern) keeps emitted
  * rows exactly-once across the stop.
  */
class StreamRestartSpec extends AnyFunSuite {

  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def us(minute: Long): Long = 3600000000L + minute * 60000000L

  private def writeFeed(dir: String, rows: Seq[(Long, Long, Long)]): Unit =
    rows.toDF("event_id", "user_id", "ts_us")
      .select(col("event_id"), col("user_id"),
        timestamp_micros(col("ts_us")).as("ts"))
      .coalesce(1).write.mode("append").parquet(dir)

  /** Run a streaming leg over `feedDir` to completion of what is
    * currently available, sinking each micro-batch into
    * `outDir/batch=<id>` (overwrite — replay-idempotent). */
  private def drain(feedDir: String, ckDir: String, outDir: String)(
      shape: DataFrame => DataFrame): Unit = {
    val q = shape(spark.readStream
      .schema(spark.read.parquet(feedDir).schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(feedDir))
      .writeStream.option("checkpointLocation", ckDir)
      .outputMode("append")
      .foreachBatch { (b: DataFrame, id: Long) =>
        b.write.mode("overwrite").parquet(s"$outDir/batch=$id")
        ()
      }
      .start()
    try q.processAllAvailable() finally q.stop()
  }

  test("session fold: open sessions survive a mid-feed restart") {
    val tmp = Files.createTempDirectory("restartsess").toFile
    val feedDir = new java.io.File(tmp, "feed").getAbsolutePath
    val ckDir = new java.io.File(tmp, "ck").getAbsolutePath
    val outDir = new java.io.File(tmp, "out").getAbsolutePath
    val gapUs = 30L * 60000000L
    // user 1: a session OPEN at the stop point (events at minutes 0, 5
    // before the stop; minute 25 lands after the restart and must MERGE
    // into the restored open session — the state-survival proof), then
    // a second session at 100; user 2: one session per half.
    val half1 = Seq((1L, 1L, us(0)), (2L, 1L, us(5)), (3L, 2L, us(2)))
    val half2 = Seq((4L, 1L, us(25)), (5L, 1L, us(100)), (6L, 2L, us(90)))
    val sentinel = Seq((-1L, -1L, us(100000)))
    def shape(in: DataFrame): DataFrame =
      StreamSessionize.sessions(in, "user_id", "ts", gapUs, "2 minutes")
    try {
      StreamRun.withStatePartitions(spark, 2) {
        writeFeed(feedDir, half1)
        drain(feedDir, ckDir, outDir)(shape)   // stop mid-feed
        writeFeed(feedDir, half2)
        drain(feedDir, ckDir, outDir)(shape)   // resume from checkpoint
        // the flush sentinel goes through its OWN drain so it cannot be
        // discovered before half2 within a run and late-drop real rows
        writeFeed(feedDir, sentinel)
        drain(feedDir, ckDir, outDir)(shape)
      }
      val got = spark.read.parquet(outDir)
        .filter(col("user_id") =!= -1L)
        .select(col("user_id"), col("n_events"), col("start_us"),
          col("dur_us"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3))).toSet
    // batch oracle over the whole feed through the SAME operator
      val oracle = StreamSessionize.sessions(
        spark.read.parquet(feedDir).filter(col("user_id") =!= -1L),
        "user_id", "ts", gapUs, "2 minutes")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3))).toSet
      assert(got == oracle,
        s"restarted session fold must equal batch: $got != $oracle")
      // the session split across the stop really merged: user 1's first
      // session must span minutes 0..25 (3 events), not be cut at 5
      assert(got.contains((1L, 3L, us(0), us(25) - us(0))),
        s"the open session must merge across the restart: $got")
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(tmp)
    }
  }

  test("stream-stream join: buffered side survives a mid-feed restart") {
    val tmp = Files.createTempDirectory("restartssj").toFile
    val vDir = new java.io.File(tmp, "views").getAbsolutePath
    val pDir = new java.io.File(tmp, "purch").getAbsolutePath
    val ckDir = new java.io.File(tmp, "ck").getAbsolutePath
    val outDir = new java.io.File(tmp, "out").getAbsolutePath
    def drainJoin(): Unit = {
      def side(dir: String, u: String, id: String, ts: String) =
        spark.readStream
          .schema(spark.read.parquet(dir).schema)
          .option("maxFilesPerTrigger", 1).parquet(dir)
          .select(col("user_id").as(u), col("event_id").as(id),
            col("ts").as(ts))
          .withWatermark(ts, "60 minutes")
      val q = side(vDir, "v_u", "vid", "vts")
        .join(side(pDir, "p_u", "pid", "pts"),
          expr("""v_u = p_u AND pts >= vts
                 |AND pts <= vts + interval 30 minutes""".stripMargin))
        .select(col("v_u").as("user_id"), col("vid"), col("pid"))
        .writeStream.option("checkpointLocation", ckDir)
        .outputMode("append")
        .foreachBatch { (b: DataFrame, id: Long) =>
          b.write.mode("overwrite").parquet(s"$outDir/batch=$id")
          ()
        }
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    try {
      StreamRun.withStatePartitions(spark, 2) {
        writeFeed(vDir, Seq((1L, 1L, us(0)), (2L, 2L, us(1))))
        writeFeed(pDir, Seq((102L, 2L, us(2))))
        drainJoin()  // emits user 2's pair; user 1's view stays buffered
        // user 1's matching purchase lands only AFTER the restart: the
        // pair can emit iff the view's join state was restored
        writeFeed(pDir, Seq((101L, 1L, us(10)), (103L, 3L, us(5))))
        drainJoin()
      }
      val got = spark.read.parquet(outDir)
        .select(col("user_id"), col("vid"), col("pid"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == Set((1L, 1L, 101L), (2L, 2L, 102L)),
        s"the buffered view must join across the restart: $got")
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(tmp)
    }
  }

  test("streaming near-dup: bucket members survive a mid-feed restart") {
    val tmp = Files.createTempDirectory("restartndup").toFile
    val feedDir = new java.io.File(tmp, "feed").getAbsolutePath
    val ckDir = new java.io.File(tmp, "ck").getAbsolutePath
    val outDir = new java.io.File(tmp, "out").getAbsolutePath
    def writeDocs(rows: Seq[(Long, Long, String)]): Unit =
      rows.toDF("doc_id", "ts_us", "text")
        .select(col("doc_id"), timestamp_micros(col("ts_us")).as("ts"),
          col("text"))
        .coalesce(1).write.mode("append").parquet(feedDir)
    val dup = "the quick brown fox jumps over the lazy dog again"
    try {
      StreamRun.withStatePartitions(spark, 2) {
        writeDocs(Seq((1L, us(0), dup),
          (2L, us(1), "entirely different words about streaming state")))
        drain(feedDir, ckDir, outDir)(
          StreamNearDup.candidates(_, "ts", "60 minutes").toDF())
        // doc 3 near-duplicates doc 1 ACROSS the restart: the pair can
        // only emit if doc 1's minhash signature was restored into the
        // band-bucket state from the checkpoint
        writeDocs(Seq((3L, us(2), dup),
          (4L, us(3), "yet another unrelated document body here")))
        drain(feedDir, ckDir, outDir)(
          StreamNearDup.candidates(_, "ts", "60 minutes").toDF())
      }
      val got = spark.read.parquet(outDir)
        .filter(col("estJaccard") >= 0.9)
        .select(col("doc1"), col("doc2")).distinct()
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == Set((1L, 3L)),
        s"the cross-restart near-dup pair (1,3) must emit: $got")
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(tmp)
    }
  }

  test("sketch lake: partial appends resume from the checkpoint") {
    val tmp = Files.createTempDirectory("restartsketch").toFile
    val feedDir = new java.io.File(tmp, "feed").getAbsolutePath
    val ckDir = new java.io.File(tmp, "ck").getAbsolutePath
    val lakeDir = new java.io.File(tmp, "lake").getAbsolutePath
    import graft.operators.SketchLake
    def drainPartials(): Unit = {
      val q = SketchLake.streamPartials(
        spark.readStream
          .schema(spark.read.parquet(feedDir).schema)
          .option("maxFilesPerTrigger", 1).parquet(feedDir),
        Seq("user_id"), "ts", "event_id", lakeDir)
        .option("checkpointLocation", ckDir)
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    try {
      StreamRun.withStatePartitions(spark, 2) {
        writeFeed(feedDir, Seq((1L, 1L, us(0)), (2L, 1L, us(1)),
          (3L, 2L, us(2))))
        drainPartials()  // stop mid-feed
        writeFeed(feedDir, Seq((2L, 1L, us(5)), (4L, 1L, us(6)),
          (5L, 2L, us(7))))
        drainPartials()  // resume from checkpoint
      }
      // rollup over the resumed lake == rollup over one-shot batch
      // partials of the whole feed (same estimator both sides); the
      // restart must neither lose a micro-batch nor let a replayed
      // append move the estimate (HLL union is idempotent)
      def roll(p: DataFrame): Set[(Long, Long)] =
        SketchLake.rollup(p, Seq("user_id"))
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val got = roll(spark.read.parquet(lakeDir))
      val oracle = roll(SketchLake.partials(
        spark.read.parquet(feedDir), Seq("user_id"), "ts", "event_id"))
      assert(got == oracle,
        s"resumed lake rollup must equal batch partials: $got != $oracle")
      assert(got == Set((1L, 3L), (2L, 2L)),
        s"distinct events per user must be exact at this scale: $got")
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(tmp)
    }
  }

  test("streaming aggregation: complete-mode fold survives a restart") {
    // the q181 monitor shape: a plain groupBy aggregation whose
    // complete-mode state (per-key moments) must be restored from the
    // checkpoint so post-restart batches EXTEND the fold rather than
    // restart it from zero
    val tmp = Files.createTempDirectory("restartagg").toFile
    val feedDir = new java.io.File(tmp, "feed").getAbsolutePath
    val ckDir = new java.io.File(tmp, "ck").getAbsolutePath
    val outDir = new java.io.File(tmp, "out").getAbsolutePath
    def drainAgg(): Unit = {
      val q = spark.readStream
        .schema(spark.read.parquet(feedDir).schema)
        .option("maxFilesPerTrigger", 1).parquet(feedDir)
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n"), sum(col("event_id")).as("sx"))
        .writeStream.option("checkpointLocation", ckDir)
        .outputMode("complete")
        .foreachBatch { (b: DataFrame, _: Long) =>
          b.write.mode("overwrite").parquet(outDir)
          ()
        }
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    try {
      StreamRun.withStatePartitions(spark, 2) {
        writeFeed(feedDir, Seq((1L, 1L, us(0)), (2L, 2L, us(1))))
        drainAgg()  // stop mid-feed
        writeFeed(feedDir, Seq((3L, 1L, us(2)), (4L, 3L, us(3))))
        drainAgg()  // resume from checkpoint
      }
      val got = spark.read.parquet(outDir)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .toSet
      // user 1's fold must span the restart: n=2, sx=1+3
      assert(got == Set((1L, 2L, 4L), (2L, 1L, 2L), (3L, 1L, 4L)),
        s"the restored fold must extend, not restart: $got")
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(tmp)
    }
  }

  test("streaming dedup: seen-content state survives a mid-feed restart") {
    val tmp = Files.createTempDirectory("restartdedup").toFile
    val feedDir = new java.io.File(tmp, "feed").getAbsolutePath
    val ckDir = new java.io.File(tmp, "ck").getAbsolutePath
    val outDir = new java.io.File(tmp, "out").getAbsolutePath
    def writeDocs(rows: Seq[(Long, Long, String)]): Unit =
      rows.toDF("doc_id", "ts_us", "text")
        .select(col("doc_id"), timestamp_micros(col("ts_us")).as("ts"),
          col("text"))
        .coalesce(1).write.mode("append").parquet(feedDir)
    try {
      StreamRun.withStatePartitions(spark, 2) {
        writeDocs(Seq((1L, us(0), "alpha body"), (2L, us(1), "beta body")))
        drain(feedDir, ckDir, outDir)(
          StreamDedup.byContent(_, "ts", "60 minutes"))
        // doc 3 duplicates doc 1's content ACROSS the restart: only the
        // checkpoint-restored seen-hash state can drop it
        writeDocs(Seq((3L, us(2), "alpha body"), (4L, us(3), "gamma body")))
        drain(feedDir, ckDir, outDir)(
          StreamDedup.byContent(_, "ts", "60 minutes"))
      }
      val got = spark.read.parquet(outDir)
        .select(col("doc_id")).collect().map(_.getLong(0)).toSet
      assert(got == Set(1L, 2L, 4L),
        s"the cross-restart duplicate (doc 3) must drop: $got")
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(tmp)
    }
  }
}
