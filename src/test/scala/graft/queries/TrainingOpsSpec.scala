package graft.queries

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants of the training-data export operators that the
  * row-compare oracle can't state directly. */
class TrainingOpsSpec extends AnyFunSuite {

  private val dir = "/root/testdata/sf0.001"

  test("sequence packing: bins are dense, conserve tokens, and respect capacity") {
    val spark = SparkTestSession.spark
    val q = graft.SparkEntry.queries("q63_sequence_packing")
    val bins = q(spark, dir).collect()
    val binIds = bins.map(_.getLong(0))
    assert(binIds.toSeq == (0L until binIds.length).toSeq,
      "bin ids must be dense from 0 — a gap means tokens were lost")
    // conservation: bin token sums add up to the corpus total
    val total = graft.Tables.load(spark, dir, "documents")
      .select(size(split(lower(trim(col("text"))), "\\s+")).cast("long").as("n"))
      .agg(sum(col("n"))).head().getLong(0)
    assert(bins.map(_.getLong(2)).sum == total)
    // capacity: a doc is assigned to the bin its FIRST token lands in,
    // so a bin's docs start strictly below (bin+1)·capacity tokens —
    // every bin except the last must have been filled to at least
    // capacity by its own docs (they may overflow into the next)
    val nonFinal = bins.dropRight(1)
    assert(nonFinal.forall(_.getLong(2) > 0))
    // doc ranges must be contiguous and ordered across bins
    val ranges = bins.map(r => (r.getLong(3), r.getLong(4)))
    ranges.sliding(2).foreach {
      case Array((_, hi), (lo2, _)) => assert(lo2 == hi + 1,
        "packing must consume documents in one contiguous doc_id order")
      case _ => ()
    }
  }

  test("mixture sample: per-language rates land near target, deterministic across runs") {
    val spark = SparkTestSession.spark
    val q = graft.SparkEntry.queries("q62_mixture_sample")
    val a = q(spark, dir).collect().map(_.getLong(0)).toSeq
    val b = q(spark, dir).collect().map(_.getLong(0)).toSeq
    assert(a == b, "hash sampling must be bit-deterministic")
    assert(a.nonEmpty)
    // en keep-rate target is 32/256 = 12.5%: with ~50 en docs at
    // sf0.001 the binomial 5σ band is wide, so just bound it loosely
    val docs = graft.Tables.load(spark, dir, "documents")
    val en = docs.filter(col("lang") === "en").count()
    val enKept = q(spark, dir).filter(col("lang") === "en").count()
    assert(enKept.toDouble / en < 0.5, s"en must be downsampled (kept $enKept/$en)")
  }

  test("temperature mixture: budget respected, head language flattened") {
    val spark = SparkTestSession.spark
    val rows = graft.SparkEntry.queries("q115_temperature_mix")(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    val n = rows.map(_._2).sum
    // quotas are floors of exact shares of ⌊N/2⌋ — they can never
    // overshoot the budget in aggregate
    assert(rows.map(_._3).sum <= n / 2,
      s"quota sum ${rows.map(_._3).sum} exceeds budget ${n / 2}")
    // every language fills its quota (all corpus langs are larger
    // than their τ-scaled quota on this fixture)
    rows.foreach { case (lang, _, quota, kept) =>
      assert(kept == quota, s"$lang kept $kept of quota $quota") }
    // ∝ √n flattening: sampling RATE must be non-increasing in corpus
    // share — the head language keeps the smallest fraction
    val byN = rows.sortBy(_._2)
    byN.sliding(2).foreach {
      case Array((_, n1, q1, _), (_, n2, q2, _)) =>
        assert(q2.toDouble / n2 <= q1.toDouble / n1 + 1e-9,
          s"rate must fall as corpus share grows: $byN")
      case _ => ()
    }
    val head = byN.last
    val tail = byN.head
    assert(head._3.toDouble / head._2 < tail._3.toDouble / tail._2,
      "the head language must be strictly flattened vs the smallest")
  }

  test("fair share: budget exhausted exactly, demands respected, waterline flat") {
    val spark = SparkTestSession.spark
    val rows = graft.SparkEntry.queries("q169_fair_share")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    val totalDemand = rows.map(_._2).sum
    val budget = 8L * totalDemand / 10L
    assert(rows.map(_._3).sum == budget,
      s"allocations must sum to the budget EXACTLY ($budget)")
    rows.foreach { case (lang, d, a, _) =>
      assert(a <= d, s"$lang allocated above its demand") }
    // non-vacuity: the fixture must exercise BOTH branches
    assert(rows.exists(_._4 == 1L) && rows.exists(_._4 == 0L),
      "fixture must produce capped AND uncapped languages")
    // max-min fairness: capped allocations differ by at most 1 (the
    // integer remainder), and every uncapped demand sits at or below
    // the waterline
    val capped = rows.filter(_._4 == 1L).map(_._3)
    assert(capped.max - capped.min <= 1, "waterline must be flat")
    val uncapped = rows.filter(_._4 == 0L).map(_._2)
    // capped now means alloc < demand, so a waterline-rank key whose
    // +1 remainder restores full demand counts as uncapped — its
    // demand may sit one above the flat waterline
    if (uncapped.nonEmpty)
      assert(uncapped.max <= capped.min + 1,
        "an uncapped demand above the waterline contradicts max-min fairness")
  }
}
