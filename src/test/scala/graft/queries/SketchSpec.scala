package graft.queries

import graft.{SparkTestSession, Tables}
import graft.functions.GraftFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Sketch vs exact ground truth on the sf0.001 corpus:
  * LSH pair sets must equal the exact-threshold pair sets, the
  * df-capped count-based Jaccard must equal the uncapped array-based
  * one, and bound-pruned IVF must equal brute force. */
class SketchSpec extends AnyFunSuite {

  private val dir = "/root/testdata/sf0.001"
  private def spark = SparkTestSession.spark
  private def docs = Tables.load(spark, dir, "documents")

  /** Uncapped array-based exact Jaccard pairs — the ground truth. */
  private def exactPairs(minJ: Double): DataFrame = {
    val sh = Sketches.shingled(docs)
    val e = sh.select(col("doc_id"), size(col("grams")).as("sz"),
      explode(col("grams")).as("g"))
    e.select(col("doc_id").as("doc1"), col("sz").as("sz1"), col("g"))
      .join(e.select(col("doc_id").as("doc2"), col("sz").as("sz2"), col("g")), Seq("g"))
      .filter(col("doc1") < col("doc2"))
      .groupBy("doc1", "doc2", "sz1", "sz2")
      .agg(count(lit(1)).as("c"))
      .withColumn("jac", col("c") / (col("sz1") + col("sz2") - col("c")))
      .filter(col("jac") >= minJ)
      .select(col("doc1"), col("doc2"), round(col("jac"), 6).as("jaccard"))
  }

  private def asSet(df: DataFrame): Set[(Long, Long, Double)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  test("df-capped count Jaccard == uncapped exact (q31 path)") {
    val got = asSet(TextOps.ngramJaccardPairs(Sketches.shingled(docs), 0.3))
    val want = asSet(exactPairs(0.3))
    assert(got == want, s"missing=${want -- got} extra=${got -- want}")
    assert(want.nonEmpty, "fixture must contain near-dup pairs")
  }

  test("prefix-filtered Jaccard == uncapped exact (q79 path)") {
    val got = asSet(TextOps.prefixJaccardPairs(Sketches.shingled(docs), 3, 10))
    val want = asSet(exactPairs(0.3))
    assert(got == want, s"missing=${want -- got} extra=${got -- want}")
  }

  test("prefix-filtered Jaccard holds at a second threshold (1/2)") {
    val got = asSet(TextOps.prefixJaccardPairs(Sketches.shingled(docs), 1, 2))
    val want = asSet(exactPairs(0.5))
    assert(got == want, s"missing=${want -- got} extra=${got -- want}")
  }

  test("containment pair set survives the df cap under a hot wrapper gram (q91 path)") {
    // Fixture where the cap actually FIRES (the sf0.001 corpus max df
    // ≈ 25 never trips MaxGramDf = 64): 73 filler docs all share one
    // boilerplate gram, and the one true containment pair (base ⊂
    // wrapper) ALSO carries it. The capped plan must drop that gram
    // from candidate generation and the overlap count — the pair has
    // to survive on its sub-hot grams alone, which is exactly the
    // documented recall bound (a pair similar ONLY via super-hot
    // boilerplate is out of scope by design).
    val s = spark
    import s.implicits._
    val hot = "visit our website"
    val base = "alpha beta gamma delta epsilon zeta " + hot
    val wrapper = base + " extra words here"
    val fillers = (100 to 172).map(i => (i.toLong, s"unique$i distinct$i $hot"))
    val fixture = (Seq((1L, base), (2L, wrapper)) ++ fillers).toDF("doc_id", "text")
    val sh = Sketches.shingled(fixture)

    // the hot gram must exceed the cap, or this test exercises nothing
    val hotDf = sh.filter(array_contains(col("grams"), hot)).count()
    assert(hotDf > TextOps.MaxGramDf,
      s"fixture hot-gram df $hotDf must exceed cap ${TextOps.MaxGramDf}")

    // uncapped ground truth: full-array intersect containment
    val a = sh.select(col("doc_id").as("doc1"), col("grams").as("g1"))
    val b = sh.select(col("doc_id").as("doc2"), col("grams").as("g2"))
    val want = a.crossJoin(b).filter(col("doc1") < col("doc2"))
      .withColumn("c", size(array_intersect(col("g1"), col("g2"))))
      .filter(col("c") >= lit(0.8) * least(size(col("g1")), size(col("g2"))))
      .select(col("doc1"), col("doc2"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = TextOps.gramPairCounts(sh)
      .filter(col("c") >= lit(0.8) * least(col("sz1"), col("sz2")))
      .select(col("doc1"), col("doc2"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(want == Set((1L, 2L)), s"fixture must contain exactly the base⊂wrapper pair, got $want")
    assert(got == want, s"missing=${want -- got} extra=${got -- want}")
  }

  test("MinHash LSH pairs == exact pairs at J>=0.8 (q35 recall)") {
    val got = asSet(Sketches.minHashPairs(docs, 0.8))
    val want = asSet(exactPairs(0.8))
    assert(got == want, s"missing=${want -- got} extra=${got -- want}")
  }

  test("SimHash banded pairing finds ALL pairs with hamming <= 3") {
    // 4 bands × 15 bits: hamming ≤ 3 < 4 forces one identical band
    // (pigeonhole) — the banding is exact for this radius
    val sketches = Sketches.simHash(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    val brute = (for {
      (id1, h1) <- sketches; (id2, h2) <- sketches
      if id1 < id2
      ham = java.lang.Long.bitCount(h1 ^ h2)
      if ham <= 3
    } yield (id1, id2, ham)).toSet
    val got = Sketches.simHashPairs(docs, 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == brute, s"missing=${brute -- got} extra=${got -- brute}")
    assert(brute.nonEmpty, "fixture must contain simhash near-dups")
  }

  test("SimHash pairing is bucket-size invariant: in-list == join fallback (q50)") {
    def asSet(df: DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val default = asSet(Sketches.simHashPairs(docs, 3))
    // maxBucket=2 forces (almost) every bucket through the distributed
    // self-join fallback; Int.MaxValue keeps everything in-list — the
    // three strategies must produce the IDENTICAL pair set
    val allJoin = asSet(Sketches.simHashPairs(docs, 3, maxBucket = 2))
    val allInList = asSet(Sketches.simHashPairs(docs, 3, maxBucket = Int.MaxValue))
    assert(default == allInList)
    assert(default == allJoin,
      s"missing=${allJoin -- default} extra=${default -- allJoin}")
    assert(default.nonEmpty)
  }

  test("MinHash pairing is bucket-size invariant (q35 hot-bucket path)") {
    val viaJoin = asSet(Sketches.minHashPairs(docs, 0.8, maxBucket = 2))
    val want = asSet(exactPairs(0.8))
    assert(viaJoin == want, s"missing=${want -- viaJoin} extra=${viaJoin -- want}")
  }

  test("bucket-strategy audit: fixture exercises multi-entry buckets") {
    // the pair pipelines band exact-dup-collapsed docs — audit the same
    val reps = docs
      .select(md5(col("text").cast("binary")).as("k"), col("doc_id"), col("text"))
      .groupBy("k")
      .agg(min(struct(col("doc_id"), col("text"))).as("r"))
      .select(col("r.doc_id").as("doc_id"), col("r.text").as("text"))
    val mh = Sketches.minHashBuckets(Sketches.shingled(reps))
    val sh = Sketches.simHashBuckets(Sketches.simHash(reps))
    // multi-entry buckets exist (the pair tests above are non-vacuous)
    assert(mh.filter(size(col("ds")) >= 2).count() > 0)
    assert(sh.filter(size(col("ds")) >= 2).count() > 0)
    // overCapBuckets now audits the quadratic (join-path) share, and at
    // maxBucket=1 every multi-entry bucket is over-cap
    assert(Sketches.overCapBuckets(sh, maxBucket = 1) > 0)
  }

  test("bound-pruned IVF == brute force (q40 exactness)") {
    GraftFunctions.register(spark)
    val e = Tables.load(spark, dir, "embeddings")
    val q = e.filter(col("vec_id") < 10)
    val ivf = VectorOps.ivfTopK(spark, e, q, nCentroids = 8, k = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val bf = VectorOps.bruteForceTopK(q, e, 5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(ivf == bf, s"missing=${bf -- ivf} extra=${ivf -- bf}")
  }

  test("cluster-pruned cosine pair join == all-pairs (q39 exactness)") {
    GraftFunctions.register(spark)
    val e = Tables.load(spark, dir, "embeddings")
    val pruned = VectorOps.cosinePairsExact(spark, e, 0.45, nClusters = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val all = {
      val a = e.select(col("vec_id").as("id1"), col("embedding").as("v1"))
      val b = e.select(col("vec_id").as("id2"), col("embedding").as("v2"))
      a.join(b, col("id1") < col("id2"))
        .withColumn("raw", expr("cosine_sim(v1, v2)"))
        .filter(col("raw") >= 0.45)
        .select(col("id1"), col("id2"), round(col("raw"), 4).as("cs"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    }
    assert(pruned == all, s"missing=${all -- pruned} extra=${pruned -- all}")
  }
}
