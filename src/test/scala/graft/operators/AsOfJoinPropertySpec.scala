package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Randomized equivalence of [[AsOfJoin.lastAtOrBefore]] against a
  * driver-side brute force (for every left row, linearly scan the
  * right side for the latest row at or before it) — a shape-free
  * reference, so agreement pins the union-window algorithm itself:
  * inclusive matching, per-key isolation, NULL on no-match, and
  * value/time columns always drawn from the SAME matched row.
  *
  * The generator keeps (key, time) unique on the right (the operator's
  * documented determinism contract for non-orderable ties lives in
  * AsOfJoinSpec's targeted cases); times collide across keys and with
  * left probes, values include NULLs and negatives, and some keys
  * exist on only one side.
  */
class AsOfJoinPropertySpec extends AnyFunSuite {

  test("40 seeded random datasets match the brute-force reference") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    val rnd = new scala.util.Random(0xa50f1234)
    for (round <- 1 to 40) {
      val nKeys = 1 + rnd.nextInt(5)
      val right = (0 until rnd.nextInt(40)).map { _ =>
        (rnd.nextInt(nKeys + 2).toLong, rnd.nextInt(25).toLong,
          if (rnd.nextInt(5) == 0) null
          else java.lang.Long.valueOf(rnd.nextInt(100) - 50L))
      }.distinct.groupBy(r => (r._1, r._2)).map(_._2.head).toSeq
      val left = (0 until 1 + rnd.nextInt(30)).map { i =>
        (i.toLong, rnd.nextInt(nKeys + 2).toLong, rnd.nextInt(25).toLong)
      }
      val rightDf = right.toDF("k", "t", "v")
        .withColumn("vt", org.apache.spark.sql.functions.col("t"))
      val leftDf = left.toDF("id", "k", "t")
      val rows = AsOfJoin.lastAtOrBefore(leftDf, rightDf,
          keyCol = "k", timeCol = "t", valueCols = Seq("v", "vt"))
        .collect()
      assert(rows.length == left.size,
        s"round $round: expected exactly one output row per left row")
      val got = rows
        .map(r => r.getLong(0) -> (
          if (r.isNullAt(3)) None else Some(r.getLong(3)),
          if (r.isNullAt(4)) None else Some(r.getLong(4))))
        .toMap
      left.foreach { case (id, k, t) =>
        val expect = right.filter(r => r._1 == k && r._2 <= t)
          .sortBy(_._2).lastOption
        val expected = expect match {
          case Some((_, rt, v)) => (Option(v).map(_.longValue), Some(rt))
          case None => (None, None)
        }
        assert(got(id) == expected,
          s"round $round: left ($id,$k,$t) got ${got(id)}, " +
            s"expected $expected from right=$right")
      }
    }
  }
}
