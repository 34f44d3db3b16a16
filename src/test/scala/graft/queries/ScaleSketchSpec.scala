package graft.queries

import graft.{SparkTestSession, Tables}
import graft.functions.GraftFunctions
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Properties of the round-7 sketches: SRP-LSH (q70) and the count-min
  * sketch (q72), checked on the sf0.001 fixtures. */
class ScaleSketchSpec extends AnyFunSuite {

  private val dir = "/root/testdata/sf0.001"
  private def spark = SparkTestSession.spark
  private def embeddings = Tables.load(spark, dir, "embeddings")
  private def documents = Tables.load(spark, dir, "documents")

  test("SRP sign matrix is ±1, stable, and balanced-ish") {
    val s = VectorOps.srpSigns
    assert(s.length == VectorOps.SrpPlanes && s.forall(_.length == 64))
    assert(s.flatten.forall(v => v == 1 || v == -1))
    // md5 high nibbles are uniform: the global +1 share sits near 1/2
    val plus = s.flatten.count(_ == 1).toDouble / (VectorOps.SrpPlanes * 64)
    assert(plus > 0.4 && plus < 0.6, s"sign share $plus")
    assert(VectorOps.srpSigns == s) // deterministic across accesses
  }

  test("SRP band codes: one row per (vector, band), codes in [0, 256)") {
    val n = embeddings.count()
    val codes = VectorOps.srpBandCodes(embeddings)
    assert(codes.count() == n * VectorOps.SrpBands)
    val bad = codes.filter(col("code") < 0 || col("code") > 255 ||
      col("band") < 0 || col("band") >= VectorOps.SrpBands).count()
    assert(bad == 0)
  }

  test("SRP top-k: every hit is a genuine band collision, k respected") {
    GraftFunctions.register(spark)
    val q = embeddings.filter(col("vec_id") < 5)
    val got = VectorOps.srpTopK(embeddings, q, k = 3)
    val perQ = got.groupBy("qid").count().collect()
    assert(perQ.forall(_.getLong(1) <= 3))
    // re-derive the candidate set: each (qid, cid) must share a band
    val codes = VectorOps.srpBandCodes(embeddings)
    val shared = codes.select(col("vec_id").as("qid"), col("band"), col("code"))
      .join(codes.select(col("vec_id").as("cid"), col("band"), col("code")),
        Seq("band", "code"))
      .filter(col("qid") =!= col("cid"))
      .select("qid", "cid").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val hits = got.select("qid", "cid")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(hits.subsetOf(shared), s"non-candidate hits: ${hits -- shared}")
  }

  test("minhash_sig kernel == the SQL HOF formulation") {
    GraftFunctions.register(spark)
    val sh = Sketches.shingled(documents)
    val hof = sh.withColumn("hs", expr(
        "transform(grams, g -> cast(conv(substring(md5(cast(g as binary)),1,15),16,10) as bigint) % 2147483648)"))
      .withColumn("sig", array(Sketches.seeds.map { case (a, b) =>
        expr(s"array_min(transform(hs, h -> ($a * h + $b) % ${Sketches.P}))")
      }: _*))
      .select(col("doc_id"), col("sig"))
    val fused = sh.selectExpr("doc_id", "minhash_sig(grams) AS sig")
    val a = hof.collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val b = fused.collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(a == b)
    assert(a.nonEmpty)
  }

  test("count-min estimate dominates the true count for EVERY token") {
    val tok = documents
      .select(explode_outer(split(lower(trim(col("text"))), "\\s+")).as("tk"))
    val cells = tok
      .select(explode(sequence(lit(0), lit(3))).as("d"), col("tk"))
      .groupBy(col("d"),
        (Sketches.hash60(concat(col("d").cast("string"), lit(":"), col("tk"))) % 256)
          .as("bucket"))
      .agg(count(lit(1)).as("cnt"))
    val tc = tok.groupBy(col("tk")).agg(count(lit(1)).as("true_cnt"))
    val est = tc
      .select(col("tk"), col("true_cnt"), explode(sequence(lit(0), lit(3))).as("d"))
      .withColumn("bucket",
        Sketches.hash60(concat(col("d").cast("string"), lit(":"), col("tk"))) % 256)
      .join(broadcast(cells), Seq("d", "bucket"))
      .groupBy(col("tk"), col("true_cnt")).agg(min(col("cnt")).as("est"))
    val under = est.filter(col("est") < col("true_cnt")).count()
    assert(under == 0, "CMS must never underestimate")
    // and the total overestimate is bounded by d*N/w per token on average
    val n = tok.count()
    val worst = est.select(max(col("est") - col("true_cnt"))).head().getLong(0)
    assert(worst <= n, s"absurd overestimate $worst for $n tokens")
  }
}
