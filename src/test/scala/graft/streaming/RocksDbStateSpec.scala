package graft.streaming

import java.nio.file.{Files, Path}
import java.sql.Timestamp

import graft.SparkTestSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** The 100 TB state-store configuration, exercised for real: the same
  * streaming dedup that runs on the default (HDFS-backed, on-heap)
  * provider runs on RocksDB — keyed state spills off-heap to local
  * disk, so state size is bounded by disk, not executor heap. This is
  * the scale posture BASELINE.md's north star names; the suite proves
  * the operators are provider-agnostic (same results) and that RocksDB
  * actually engaged (snapshot artifacts in the checkpoint, not the
  * HDFS provider's .delta files).
  */
case class SsjEv(ts: Timestamp, user_id: Long, event_id: Long)

class RocksDbStateSpec extends AnyFunSuite {

  private def ts(minute: Int) = new Timestamp(3600000L + minute * 60000L)

  private def listRec(p: Path): Seq[Path] = {
    val s = java.nio.file.Files.walk(p)
    try {
      val it = s.iterator()
      val b = scala.collection.mutable.ArrayBuffer.empty[Path]
      while (it.hasNext) b += it.next()
      b.toSeq
    } finally s.close()
  }

  /** Checkpoint dirs hold RocksDB snapshot artifacts — delete them
    * after each test instead of leaking a copy per run. */
  private def withCheckpointDir(f: Path => Unit): Unit = {
    val ck = Files.createTempDirectory("rocksck")
    try f(ck)
    finally listRec(ck).sortBy(-_.getNameCount)
      .foreach(p => try Files.deleteIfExists(p) catch { case _: Exception => () })
  }

  test("StreamDedup runs on RocksDBStateStoreProvider with identical semantics") {
    // newSession: same SparkContext, isolated SQLConf — the provider
    // switch must not leak into suites sharing SparkTestSession.spark
    val spark = SparkTestSession.spark.newSession()
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    spark.conf.set(
      "spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    import spark.implicits._
    implicit val ctx = spark.sqlContext

    withCheckpointDir { ck =>
    val in = MemoryStream[Doc]
    val q = StreamDedup.byContent(in.toDF(), "ts", "10 minutes")
      .select("doc_id", "text")
      .writeStream.format("memory").queryName("rocks_dedup_out")
      .outputMode("append")
      .option("checkpointLocation", ck.toString)
      .trigger(Trigger.ProcessingTime("100 milliseconds"))
      .start()
    def out() = spark.table("rocks_dedup_out")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq

    in.addData(Doc(ts(0), 1, "alpha"), Doc(ts(1), 2, "alpha"),
      Doc(ts(1), 3, "beta"))
    q.processAllAvailable()
    assert(out().map(_._2).sorted == Seq("alpha", "beta"))
    in.addData(Doc(ts(5), 4, "alpha"), Doc(ts(5), 5, "gamma"))
    q.processAllAvailable()
    assert(out().count(_._2 == "alpha") == 1, "cross-batch dup must drop")

    // eviction past the horizon behaves identically on RocksDB
    in.addData(Doc(ts(40), 6, "delta"))
    q.processAllAvailable()
    in.addData(Doc(ts(41), 7, "alpha"))
    q.processAllAvailable()
    assert(out().count(_._2 == "alpha") == 2,
      s"watermark TTL must evict RocksDB state too: ${out()}")

    // the state operator reported rows, and the checkpoint holds
    // RocksDB artifacts (snapshot .zip / .changelog), not the HDFS
    // provider's .delta files — proof the provider switch took effect
    val prog = q.lastProgress
    assert(prog.stateOperators.nonEmpty &&
      prog.stateOperators.head.numRowsTotal >= 1)
    q.stop()
    val names = listRec(ck).map(_.getFileName.toString)
    assert(names.exists(n => n.endsWith(".zip") || n.endsWith(".changelog")),
      s"expected RocksDB snapshot artifacts in checkpoint, got: $names")
    assert(!names.exists(_.endsWith(".delta")),
      "HDFS-provider .delta files imply RocksDB was not engaged")
    }
  }

  test("watermark eviction SHRINKS RocksDB state (numRowsTotal drops)") {
    // The 100 TB claim for the streaming operators is bounded state —
    // which holds only if rows actually LEAVE the store once the
    // watermark passes the horizon. Drive both TTL'd operators on the
    // RocksDB provider and read the engine's own state metrics: the
    // peak row count must drop after event time jumps past the horizon.
    val spark = SparkTestSession.spark.newSession()
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    spark.conf.set(
      "spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    import spark.implicits._
    implicit val ctx = spark.sqlContext

    def stateRows(q: org.apache.spark.sql.streaming.StreamingQuery): Long = {
      val p = q.lastProgress
      assert(p != null && p.stateOperators.nonEmpty, "no state metrics yet")
      p.stateOperators.map(_.numRowsTotal).sum
    }

    // ---- StreamDedup: one state row per distinct content ----------------
    withCheckpointDir { ck =>
      val in = MemoryStream[Doc]
      val q = StreamDedup.byContent(in.toDF(), "ts", "10 minutes")
        .select("doc_id", "text")
        .writeStream.format("memory").queryName("rocks_evict_dedup")
        .outputMode("append")
        .option("checkpointLocation", ck.toString)
        .trigger(Trigger.ProcessingTime("100 milliseconds"))
        .start()
      in.addData((1 to 20).map(i => Doc(ts(0), i.toLong, s"text $i body")): _*)
      q.processAllAvailable()
      val peak = stateRows(q)
      assert(peak >= 20, s"expected >=20 dedup state rows, got $peak")
      // jump event time far past the horizon; the next batches run with
      // an advanced watermark and must expire every old content key
      in.addData(Doc(ts(60), 100L, "far future a"))
      q.processAllAvailable()
      in.addData(Doc(ts(61), 101L, "far future b"))
      q.processAllAvailable()
      val after = stateRows(q)
      assert(after < peak && after <= 3,
        s"dedup state must shrink after the horizon: peak=$peak after=$after")
      q.stop()
    }

    // ---- StreamNearDup: 32 band-bucket state rows per distinct doc ------
    withCheckpointDir { ck =>
      val in = MemoryStream[Doc]
      val q = StreamNearDup.candidates(in.toDF(), "ts", "10 minutes")
        .toDF()
        .writeStream.format("memory").queryName("rocks_evict_neardup")
        .outputMode("append")
        .option("checkpointLocation", ck.toString)
        .trigger(Trigger.ProcessingTime("100 milliseconds"))
        .start()
      val mk = (seed: Char) => (1 to 30).map(i => s"$seed$i").mkString(" ")
      in.addData(Doc(ts(0), 1, mk('a')), Doc(ts(0), 2, mk('b')),
        Doc(ts(1), 3, mk('c')))
      q.processAllAvailable()
      val peak = stateRows(q)
      assert(peak >= 32, s"expected >=32 LSH bucket rows, got $peak")
      in.addData(Doc(ts(60), 4, mk('d')))
      q.processAllAvailable()
      in.addData(Doc(ts(61), 5, mk('e')))
      q.processAllAvailable()
      val after = stateRows(q)
      assert(after < peak && after <= 64,
        s"LSH bucket state must shrink after the horizon: peak=$peak after=$after")
      q.stop()
    }
  }

  test("stream-stream join evicts mid-run on RocksDB; on-time pairs match batch") {
    // q132's oracle run deliberately uses a span-derived watermark so
    // eviction never fires during the compare (determinism); this is
    // the complementary proof with a SHORT real delay: join state
    // numRowsTotal drops once event time passes the horizon, on-time
    // pairs still equal the batch interval join restricted to on-time
    // rows, and a late row whose partner was evicted produces nothing.
    val spark = SparkTestSession.spark.newSession()
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    spark.conf.set(
      "spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    import org.apache.spark.sql.functions._
    import spark.implicits._
    implicit val ctx = spark.sqlContext

    withCheckpointDir { ck =>
      val vin = MemoryStream[SsjEv]
      val pin = MemoryStream[SsjEv]
      val views = vin.toDF()
        .select(col("user_id").as("v_u"), col("event_id").as("vid"),
          col("ts").as("vts"))
        .withWatermark("vts", "10 minutes")
      val purchases = pin.toDF()
        .select(col("user_id").as("p_u"), col("event_id").as("pid"),
          col("ts").as("pts"))
        .withWatermark("pts", "10 minutes")
      val q = views
        .join(purchases,
          expr("""v_u = p_u AND pts >= vts
                 |AND pts <= vts + interval 30 minutes""".stripMargin))
        .select(col("v_u").as("user_id"), col("vid"), col("pid"))
        .writeStream.format("memory").queryName("rocks_ssj_out")
        .outputMode("append")
        .option("checkpointLocation", ck.toString)
        .trigger(Trigger.ProcessingTime("100 milliseconds"))
        .start()
      def pairs() = spark.table("rocks_ssj_out")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      def stateRows(): Long = {
        val p = q.lastProgress
        assert(p != null && p.stateOperators.nonEmpty, "no state metrics yet")
        p.stateOperators.map(_.numRowsTotal).sum
      }

      // 10 views, 5 matching purchases inside the 30-minute window
      vin.addData((1 to 10).map(u => SsjEv(ts(0), u.toLong, u.toLong)): _*)
      pin.addData((1 to 5).map(u => SsjEv(ts(5), u.toLong, 100L + u)): _*)
      q.processAllAvailable()
      val expectedOnTime =
        (1 to 5).map(u => (u.toLong, u.toLong, 100L + u)).toSet
      assert(pairs() == expectedOnTime,
        s"on-time pairs must match the batch interval join: ${pairs()}")
      val peak = stateRows()
      assert(peak >= 15, s"expected >=15 join state rows, got $peak")

      // jump event time far past horizon + window: old rows must leave
      vin.addData(SsjEv(ts(120), 100L, 1000L))
      pin.addData(SsjEv(ts(121), 100L, 2000L))
      q.processAllAvailable()
      vin.addData(SsjEv(ts(125), 101L, 1001L))
      pin.addData(SsjEv(ts(126), 101L, 2001L))
      q.processAllAvailable()
      val after = stateRows()
      assert(after < peak && after <= 8,
        s"join state must shrink past the horizon: peak=$peak after=$after")

      // a late purchase whose matching view was evicted emits nothing
      pin.addData(SsjEv(ts(10), 6L, 106L))
      q.processAllAvailable()
      assert(pairs() == expectedOnTime +
        ((100L, 1000L, 2000L)) + ((101L, 1001L, 2001L)),
        s"late row past the watermark must be dropped: ${pairs()}")
      q.stop()
    }
  }

  test("Debounce (flatMapGroupsWithState) runs on RocksDB provider") {
    val spark = SparkTestSession.spark.newSession()
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    spark.conf.set(
      "spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    import spark.implicits._
    implicit val ctx = spark.sqlContext

    withCheckpointDir { ck =>
    val in = MemoryStream[Debounce.Event]
    val q = Debounce(in.toDS(), intervalMs = 300)
      .writeStream.format("memory").queryName("rocks_debounce_out")
      .option("checkpointLocation", ck.toString)
      .trigger(Trigger.ProcessingTime("100 milliseconds"))
      .start()

    in.addData(
      Debounce.Event("k1", "UPDATE", 10L, 1, "v1"),
      Debounce.Event("k1", "UPDATE", 11L, 2, "v2"))
    // flush fires on the processing-time timer; poll the sink
    val deadline = System.currentTimeMillis() + 60000
    def rows() = spark.table("rocks_debounce_out").collect()
    while (rows().length < 1 && System.currentTimeMillis() < deadline)
      Thread.sleep(200)
    val got = rows().map(r =>
      (r.getAs[String]("key"), r.getAs[Long]("lsn"))).toSeq
    assert(got == Seq(("k1", 11L)),
      s"newest-wins compaction must hold on RocksDB: ${got.toList}")
    q.stop()
    val names = listRec(ck).map(_.getFileName.toString)
    assert(names.exists(n => n.endsWith(".zip") || n.endsWith(".changelog")),
      s"expected RocksDB artifacts, got: $names")
    }
  }
}
