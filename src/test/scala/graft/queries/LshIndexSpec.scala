package graft.queries

import graft.SparkTestSession
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.{ShuffledHashJoinExec, SortMergeJoinExec}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The persisted LSH index: screening finds exactly the exact-Jaccard
  * cross pairs, the candidate join leaves the bucketed posting table
  * in place (only the batch side shuffles — the 100 TB point), and
  * appends keep the index incremental. */
class LshIndexSpec extends AnyFunSuite {

  private val spark = SparkTestSession.spark
  import spark.implicits._

  private val base = (1 to 30).map(i => s"w$i").mkString(" ")
  private val nearDup = (1 to 29).map(i => s"w$i").mkString(" ") + " zz"
  private def uniq(seed: Char) = (1 to 30).map(i => s"$seed$i").mkString(" ")

  private def exactPairs(batch: Seq[(Long, String)],
      corpus: Seq[(Long, String)], minJ: Double): Set[(Long, Long)] = {
    def grams(t: String): Set[String] = {
      val w = t.trim.toLowerCase.split("\\s+")
      (0 to w.length - 3).map(i => s"${w(i)} ${w(i + 1)} ${w(i + 2)}").toSet
    }
    (for {
      (i1, t1) <- batch; (i2, t2) <- corpus
      g1 = grams(t1); g2 = grams(t2)
      if g1.nonEmpty && g2.nonEmpty
      j = g1.intersect(g2).size.toDouble / g1.union(g2).size
      if j >= minJ
    } yield (i1, i2)).toSet
  }

  test("screen == exact cross pairs; index side joins without a shuffle") {
    val corpus = Seq(1L -> base, 2L -> uniq('a'), 3L -> uniq('b'))
    val batch = Seq(10L -> nearDup, 11L -> uniq('c'), 12L -> base)
    try {
      LshIndex.build(corpus.toDF("doc_id", "text"), "lshspec", buckets = 4)
      val threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      val aqe = spark.conf.get("spark.sql.adaptive.enabled")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      // AQE wraps the tree in AdaptiveSparkPlanExec (a leaf to
      // collect()); the static plan is what the assertion reads
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      try {
        val screened = LshIndex.screen(batch.toDF("doc_id", "text"),
          "lshspec", 0.8)
        val got = screened.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        assert(got == exactPairs(batch, corpus, 0.8),
          s"screen must equal the exact cross-pair set: $got")
        // the bucketed posting table joins IN PLACE: some shuffle-join
        // has the postings scan beneath it with no exchange in between
        val plan = screened.queryExecution.executedPlan
        val joinChildren = plan.collect {
          case j: SortMergeJoinExec => Seq(j.left, j.right)
          case j: ShuffledHashJoinExec => Seq(j.left, j.right)
        }.flatten
        val inPlace = joinChildren.exists(side =>
          side.collect { case s: ShuffleExchangeExec => s }.isEmpty &&
            side.collect { case f: FileSourceScanExec => f }.exists(
              _.tableIdentifier.exists(_.table == "lshspec_postings")))
        assert(inPlace,
          s"postings must join bucket-aligned, not re-shuffled:\n$plan")
      } finally {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
        spark.conf.set("spark.sql.adaptive.enabled", aqe)
      }

      // incremental append: land the batch, screen a second batch that
      // near-dups one of the APPENDED docs
      LshIndex.append(batch.toDF("doc_id", "text"), "lshspec", buckets = 4)
      val second = Seq(20L -> nearDup, 21L -> uniq('d'))
      val got2 = LshIndex.screen(second.toDF("doc_id", "text"), "lshspec", 0.8)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got2 == exactPairs(second, corpus ++ batch, 0.8),
        s"screen after append must see the landed batch: $got2")
      assert(got2.contains((20L, 10L)),
        "the second batch's near-dup of an APPENDED doc must surface")
    } finally {
      spark.sql("drop table if exists lshspec_postings")
      spark.sql("drop table if exists lshspec_grams")
    }
  }
}
