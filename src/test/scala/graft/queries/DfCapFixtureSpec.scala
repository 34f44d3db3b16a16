package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** df-adversarial fixture for the MaxGramDf posting cap (r12 ask #3):
  * the standard corpora never exceed df ≈ 25 ≪ 64, so until this
  * suite the cap's semantics — a gram seen in MORE than MaxGramDf
  * docs contributes NO pair overlaps — were green by fixture
  * accident. Here a boilerplate gram sits at df = 70 (over the cap:
  * every pair it would have created must vanish), another at exactly
  * df = 64 (AT the cap: the boundary is inclusive, all C(64,2) pairs
  * survive), and a rare gram at df = 2 anchors the normal path. The
  * same window (2..MaxGramDf) is now mirrored in the q299/q307
  * oracles' `gok` CTE, and `scripts/dfcap_fixture.py` builds this
  * corpus as a parquet dir so the full Verify→DuckDB compare can run
  * on it (done for round 13 — both queries green).
  */
class DfCapFixtureSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** (doc_id, grams): 70 docs sharing only the hot gram, 64 docs
    * sharing the at-cap gram, one rare-gram pair. */
  private lazy val sh = {
    val hot = (0L until 70L).map(i => (i, Seq("HOT", s"u$i")))
    val edge = (100L until 164L).map(i => (i, Seq("EDGE", s"e$i")))
    val rare = Seq((200L, Seq("RARE", "r200")), (201L, Seq("RARE", "r201")))
    (hot ++ edge ++ rare).toDF("doc_id", "grams")
  }

  test("an over-cap gram (df = 70 > 64) contributes zero pairs; the " +
    "at-cap gram (df = 64) keeps all C(64,2); rare grams unaffected") {
    val pc = TextOps.gramPairCounts(sh)
      .select(col("doc1"), col("doc2"), col("c"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))

    val hotPairs = pc.filter { case (d1, d2, _) => d1 < 70 && d2 < 70 }
    assert(hotPairs.isEmpty,
      s"over-cap gram leaked ${hotPairs.length} pairs into the counts")

    val edgePairs = pc.filter { case (d1, d2, _) =>
      d1 >= 100 && d1 < 164 && d2 >= 100 && d2 < 164 }
    assert(edgePairs.length == 64 * 63 / 2,
      s"at-cap gram must keep all C(64,2) pairs, got ${edgePairs.length}")
    assert(edgePairs.forall(_._3 == 1L))

    val rarePair = pc.filter { case (d1, d2, _) => d1 >= 200 || d2 >= 200 }
    assert(rarePair.toSeq == Seq((200L, 201L, 1L)))
  }

  test("the capped result DIVERGES from an uncapped count here — the " +
    "fixture really is adversarial, not vacuously green") {
    val e = sh.select(col("doc_id"), explode(col("grams")).as("g"))
    val uncapped = e.as("a").join(e.as("b"),
        col("a.g") === col("b.g") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc1"), col("b.doc_id").as("doc2"))
      .agg(count(lit(1)).as("c"))
    val nUncapped = uncapped.count()
    val nCapped = TextOps.gramPairCounts(sh).count()
    // uncapped adds exactly the C(70,2) hot-gram pairs
    assert(nUncapped == nCapped + 70L * 69L / 2L,
      s"expected the hot gram to add C(70,2) pairs: $nUncapped vs $nCapped")
  }

  test("the oracle-mirror window (HAVING df BETWEEN 2 AND 64) computes " +
    "the SAME pair set as the plan on this fixture") {
    // the gok CTE the q299/q307 oracles now apply, replayed in Spark:
    // keep only grams whose df sits in the posting window, then count
    // pair overlaps — must equal gramPairCounts exactly
    val e = sh.select(struct(col("doc_id").as("d"),
      size(col("grams")).as("sz")).as("ds"), explode(col("grams")).as("g"))
    val gok = e.groupBy(col("g")).agg(count(lit(1)).as("df"))
      .filter(col("df").between(2, TextOps.MaxGramDf))
      .select(col("g"))
    val mirrored = e.join(gok, "g")
      .select(col("g"), col("ds.d").as("doc"), col("ds.sz").as("sz"))
    val pairs = mirrored.as("a").join(mirrored.as("b"),
        col("a.g") === col("b.g") && col("a.doc") < col("b.doc"))
      .groupBy(col("a.doc").as("doc1"), col("b.doc").as("doc2"),
        col("a.sz").as("sz1"), col("b.sz").as("sz2"))
      .agg(count(lit(1)).as("c"))
      .orderBy(col("doc1"), col("doc2"))
      .collect().map(_.toSeq).toSeq
    val plan = TextOps.gramPairCounts(sh)
      .select(col("doc1"), col("doc2"), col("sz1"), col("sz2"), col("c"))
      .orderBy(col("doc1"), col("doc2"))
      .collect().map(_.toSeq).toSeq
    assert(pairs == plan, "oracle-mirror window diverged from the plan")
  }
}
