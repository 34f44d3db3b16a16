package graft.queries

import graft.{SparkTestSession, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants of the lake-lifecycle operators that the row-compare
  * oracle can't state directly: the CUSUM prefix-min identity against
  * the literal sequential recurrence (the whole point of q149's
  * formulation), the SCD2 interval-tiling laws, and the line-dedup
  * reconstruction contract. */
class LakeOpsSpec extends AnyFunSuite {

  private val dir = "/root/testdata/sf0.001"
  private def spark = SparkTestSession.spark

  test("cusum prefix-min identity equals the sequential recurrence") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(20260814L)
    // hostile shapes: all-negative, all-positive, zeros, sign flips,
    // ties in dev values, single-row groups
    val groups: Seq[(String, Seq[Long])] = Seq(
      "neg" -> Seq.fill(50)(-(rnd.nextInt(100) + 1).toLong),
      "pos" -> Seq.fill(50)((rnd.nextInt(100) + 1).toLong),
      "zero" -> Seq.fill(20)(0L),
      "mix" -> Seq.fill(200)(rnd.nextInt(201).toLong - 100),
      "tie" -> Seq(5L, -5L, 5L, -5L, 5L, -5L),
      "one" -> Seq(-7L))
    val rows = groups.flatMap { case (g, devs) =>
      devs.zipWithIndex.map { case (v, i) => (g, i.toLong, v) }
    }
    val got = LakeOps.cusum(rows.toDF("g", "i", "dev"),
        Seq("g"), Seq("i"), "dev")
      .select(col("g"), col("i"), col("cusum")).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    for ((g, devs) <- groups) {
      var c = 0L
      devs.zipWithIndex.foreach { case (v, i) =>
        c = math.max(0L, c + v)
        assert(got((g, i.toLong)) == c,
          s"group $g row $i: identity gave ${got((g, i.toLong))}, " +
            s"sequential fold gives $c")
      }
    }
  }

  test("scd2 intervals tile each user's timeline exactly") {
    val q = graft.SparkEntry.queries("q141_scd2_intervals")(spark, dir)
    val rows = q.collect().map(r => (r.getLong(0), r.getString(1),
      r.getLong(2), if (r.isNullAt(3)) None else Some(r.getLong(3)),
      r.getLong(4)))
    val byUser = rows.groupBy(_._1)
    assert(byUser.nonEmpty)
    for ((u, ivs) <- byUser) {
      val sorted = ivs.sortBy(_._3)
      // exactly one open (current) interval per user, and it is last
      assert(sorted.count(_._4.isEmpty) == 1, s"user $u open intervals")
      assert(sorted.last._4.isEmpty && sorted.last._5 == 1L,
        s"user $u: the open interval must be the last and flagged")
      // each interval closes exactly where the next opens (no gaps,
      // no overlap), and adjacent intervals never share a state
      // (otherwise the change-collapse failed)
      sorted.sliding(2).foreach {
        case Array((_, st1, _, Some(to1), fl1), (_, st2, from2, _, _)) =>
          assert(to1 == from2, s"user $u: gap/overlap $to1 vs $from2")
          assert(st1 != st2, s"user $u: uncollapsed repeat state $st1")
          assert(fl1 == 0L)
        case _ => ()
      }
    }
  }

  test("sweep-line peak equals brute force over random interval sets") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(157157L)
    // random closed intervals per group, with deliberate boundary
    // collisions: ends meeting starts at the same instant, duplicate
    // intervals, point intervals (t0 == t1)
    val groups = (0 until 6).map { g =>
      val ivs = (0 until (5 + rnd.nextInt(40))).map { i =>
        val t0 = rnd.nextInt(50).toLong
        val t1 = t0 + rnd.nextInt(10).toLong
        (s"g$g", i.toLong, i.toLong, t0, t1)
      }
      s"g$g" -> ivs
    }
    val df = groups.flatMap(_._2).toDF("et", "u", "sid", "t0", "t1")
    val got = LakeOps.peakConcurrency(df).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    for ((g, ivs) <- groups) {
      // brute force: inclusive coverage count at every boundary instant
      val instants = ivs.flatMap(iv => Seq(iv._4, iv._5)).distinct.sorted
      val cover = instants.map(t =>
        t -> ivs.count(iv => iv._4 <= t && t <= iv._5).toLong)
      val peak = cover.map(_._2).max
      val firstAt = cover.filter(_._2 == peak).map(_._1).min
      assert(got(g) == ((peak, firstAt)),
        s"group $g: got ${got(g)}, brute force ($peak, $firstAt)")
    }
  }

  test("line dedup: counts tile the doc and clean docs reconstruct") {
    val docs = Tables.load(spark, dir, "documents")
    val q = graft.SparkEntry.queries("q144_line_dedup")(spark, dir)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), if (r.isNullAt(3)) null
         else r.getString(3))).toMap
    val raw = docs.select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(q.keySet == raw.keySet, "every doc must appear in the report")
    var untouched = 0
    for ((id, text) <- raw) {
      val words = text.split(" ", -1)
      val nLines = math.ceil(words.length / 4.0).toLong
      val (kept, dropped, h) = q(id)
      assert(kept + dropped == nLines,
        s"doc $id: $kept+$dropped != $nLines lines")
      if (dropped == 0) {
        // reassembly of an untouched doc = the original text re-joined
        // through its 4-word lines (identical to the original when the
        // word count isn't a multiple of 4 too — slice clamps)
        val rejoined = words.grouped(4).map(_.mkString(" ")).mkString(" ")
        val md = java.security.MessageDigest.getInstance("MD5")
          .digest(rejoined.getBytes("UTF-8"))
          .map("%02x".format(_)).mkString
        assert(h == md, s"doc $id: reconstruction hash mismatch")
        untouched += 1
      }
    }
    assert(untouched > 0, "fixture must contain untouched docs")
    assert(raw.keys.exists(id => q(id)._2 > 0),
      "fixture must contain docs with dropped lines")
  }
}
