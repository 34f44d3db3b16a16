package graft.queries

import graft.{SparkTestSession, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants of the round-9 curation operators (weighted Jaccard,
  * fuzzy decontamination) that the row-compare oracle can't state
  * directly: an independent in-JVM reference for the weighting math,
  * the boilerplate-discount behavior the operator exists for, the
  * df-cap contract, and the worst-match tie-break. */
class CurationOpsSpec extends AnyFunSuite {

  private val dir = "/root/testdata/sf0.001"
  private def spark = SparkTestSession.spark

  /** (doc_id, grams) from explicit gram sets. */
  private def gramsDf(rows: Seq[(Long, Seq[String])]): DataFrame = {
    val s = spark
    import s.implicits._
    rows.toDF("doc_id", "grams")
  }

  test("weighted Jaccard matches an independent scalar reference on the corpus") {
    val sh = Sketches.shingled(Tables.load(spark, dir, "documents"))
    val local = sh.select(col("doc_id"), col("grams")).collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1).toSet).toMap
    val df = local.values.flatten
      .groupBy(identity).map { case (g, occ) => g -> occ.size }
    val w = df.map { case (g, n) => g -> (1000000L / n) }
    val ids = local.keys.toSeq.sorted
    val want = (for {
      i <- ids; j <- ids if i < j
      inter = (local(i) & local(j)).iterator.map(w).sum
      if inter > 0
      union = local(i).iterator.map(w).sum + local(j).iterator.map(w).sum - inter
      wj = inter.toDouble / union
      if wj >= 0.5
      // HALF_UP like Spark's round (rint would round half-even)
      r6 = BigDecimal(wj).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    } yield (i, j, r6)).toSet
    val got = TextOps.weightedJaccardPairs(sh, 0.5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(want.nonEmpty, "fixture must contain weighted near-dup pairs")
    assert(got == want, s"missing=${want -- got} extra=${got -- want}")
  }

  test("weighted Jaccard discounts boilerplate, plain Jaccard does not") {
    // docs 1-10 all share boilerplate grams b1-b5 (df=10, weight 1e5);
    // docs 1,2 additionally share rare grams r1-r5 (df=2, weight 5e5);
    // docs 3,4 carry distinct private grams p*/q* (df=1)
    val rows = (1L to 10L).map { i =>
      val boiler = (1 to 5).map(k => s"b$k")
      val extra = i match {
        case 1 | 2 => (1 to 5).map(k => s"r$k")
        case 3     => (1 to 5).map(k => s"p$k")
        case 4     => (1 to 5).map(k => s"q$k")
        case n     => (1 to 5).map(k => s"x${n}_$k")
      }
      (i, boiler ++ extra)
    }
    val pairs = TextOps.weightedJaccardPairs(gramsDf(rows), 0.5)
      .select(col("doc1"), col("doc2")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // plain Jaccard for (3,4) is 5/15 = 0.333 — all of it boilerplate;
    // weighted it drops to 5e5/(2*5e5 + 2*5*5e5) ≈ 0.083: never ≥ 0.5
    assert(!pairs.contains((3L, 4L)),
      "boilerplate-only overlap must be discounted below threshold")
    // (1,2): shared rare mass dominates — 5*5e5 + 5*1e5 of shared
    // weight over the same union = weighted J = 1.0
    assert(pairs.contains((1L, 2L)),
      "rare shared content must keep the pair above threshold")
  }

  test("df cap: over-cap grams weight the totals but generate no pairs") {
    // two probe docs share ONLY one gram that (with the filler docs)
    // has df = MaxGramDf + 1 — candidate generation must skip it
    val hot = "hot_gram"
    val filler = (100L until (100L + TextOps.MaxGramDf - 1))
      .map(i => (i, Seq(hot, s"f$i")))
    val rows = Seq(
      (1L, Seq(hot, "a1", "a2")),
      (2L, Seq(hot, "z1", "z2"))) ++ filler
    val pairs = TextOps.weightedJaccardPairs(gramsDf(rows), 0.01)
      .filter((col("doc1") === 1L && col("doc2") === 2L)).collect()
    assert(pairs.isEmpty,
      "a pair whose only overlap is an over-cap gram must not surface")
  }

  test("fuzzy decontamination keeps the worst match and breaks ties low") {
    // bench 62 = {g,b}, 124 = {g,c}.
    // corpus doc 5 = {g,b} (= bench 62 exactly): J=1.0 vs 62, 5/7 vs
    //   124 → must report the MAX (62 @ 1.0).
    // corpus doc 2 = {g,d}: 5/7 vs BOTH → equal-J tie → lower id (62).
    // corpus doc 3 overlaps nothing: absent.
    val g = (1 to 5).map(k => s"g$k")
    val bench = gramsDf(Seq(
      (62L, g :+ "b_only"),
      (124L, g :+ "c_only")))
    val corpus = gramsDf(Seq(
      (5L, g :+ "b_only"),
      (2L, g :+ "d_only"),
      (3L, Seq("u1", "u2", "u3"))))
    val got = TextOps.fuzzyContaminated(corpus, bench, 0.5).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got.keySet == Set(2L, 5L))
    assert(got(5L) == (62L, 1.0), s"doc 5 must report its worst match, got $got")
    assert(got(2L)._1 == 62L, s"equal-J tie must break low, got $got")
    assert(got(2L)._2 == 0.714286)
  }

  /** Independent symbol-level greedy BPE reference: k iterations of
    * (count pairs weighted by word freq → argmax with lexicographic
    * tie-break → greedy left-to-right non-overlapping merge). */
  private def bpeRef(words: Seq[(String, Long)], k: Int): Seq[(Int, String, Long)] = {
    var seqs = words.map { case (w, f) => (w.map(_.toString).toVector, f) }
    (1 to k).map { r =>
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((syms, f) <- seqs; i <- 0 until syms.size - 1)
        counts((syms(i), syms(i + 1))) =
          counts.getOrElse((syms(i), syms(i + 1)), 0L) + f
      val ((x, y), c) = counts.toSeq
        .minBy { case ((a, b), n) => (-n, s"$a $b") }
      seqs = seqs.map { case (syms, f) =>
        val out = Vector.newBuilder[String]
        var i = 0
        while (i < syms.size) {
          if (i + 1 < syms.size && syms(i) == x && syms(i + 1) == y) {
            out += (x + y); i += 2
          } else { out += syms(i); i += 1 }
        }
        (out.result(), f)
      }
      (r, s"$x $y", c)
    }
  }

  test("BPE merges match a symbol-level reference on boundary-heavy words") {
    val s = spark
    import s.implicits._
    // aaaaa: adjacent-occurrence runs ([a,a,a,a,a] → [aa,aa,a], NOT
    //   [aa,a,aa]); abc after "ab" merge: ("b","c") must NOT fire
    //   inside the merged "ab" symbol; ties forced by equal counts
    val words = Seq(
      ("aaaaa", 7L), ("abab", 5L), ("abc", 6L), ("cab", 4L),
      ("x", 9L), ("", 2L), ("tie1", 3L), ("tie2", 3L))
    val got = TextOps.bpeMerges(
      words.toDF("w", "freq"), 4).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2))).sortBy(_._1)
    val want = bpeRef(words, 4)
    assert(got.toSeq == want, s"got=${got.toSeq}\nwant=$want")
  }

  test("BPE merges match the reference on the corpus word-type table") {
    val wf = Tables.load(spark, dir, "documents")
      .select(explode(split(lower(trim(col("text"))), "\\s+")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
    val local = wf.collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val got = TextOps.bpeMerges(wf, 5).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2))).sortBy(_._1)
    assert(got.toSeq == bpeRef(local, 5))
  }

  /** Token counts after `k` reference merges — the apply-side twin of
    * [[bpeRef]] (same greedy left-to-right merge loop, then count the
    * surviving symbols weighted by word freq). */
  private def bpeTokensRef(words: Seq[(String, Long)], k: Int)
      : Map[String, Long] = {
    var seqs = words.filter(_._1.nonEmpty)
      .map { case (w, f) => (w.map(_.toString).toVector, f) }
    for (r <- 1 to k) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((syms, f) <- seqs; i <- 0 until syms.size - 1)
        counts((syms(i), syms(i + 1))) =
          counts.getOrElse((syms(i), syms(i + 1)), 0L) + f
      val ((x, y), _) = counts.toSeq
        .minBy { case ((a, b), n) => (-n, s"$a $b") }
      seqs = seqs.map { case (syms, f) =>
        val out = Vector.newBuilder[String]
        var i = 0
        while (i < syms.size) {
          if (i + 1 < syms.size && syms(i) == x && syms(i + 1) == y) {
            out += (x + y); i += 2
          } else { out += syms(i); i += 1 }
        }
        (out.result(), f)
      }
    }
    seqs.flatMap { case (syms, f) => syms.map(_ -> f) }
      .groupBy(_._1).map { case (t, occ) => t -> occ.map(_._2).sum }
  }

  test("BPE tokenizer application matches the reference token counts") {
    val s = spark
    import s.implicits._
    val words = Seq(
      ("aaaaa", 7L), ("abab", 5L), ("abc", 6L), ("cab", 4L),
      ("x", 9L), ("tie1", 3L), ("tie2", 3L))
    val got = TextOps.bpeTokens(words.toDF("w", "freq"), 4).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == bpeTokensRef(words, 4), s"got=$got")

    val wf = Tables.load(spark, dir, "documents")
      .select(explode(split(lower(trim(col("text"))), "\\s+")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
    val local = wf.collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val gotCorpus = TextOps.bpeTokens(wf, 3).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(gotCorpus == bpeTokensRef(local, 3))
  }
}
