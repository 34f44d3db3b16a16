package graft.queries

import graft.Tables
import graft.functions.GraftFunctions
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Sketch-based near-dup detection: MinHash+LSH, SimHash, and
  * rolling-hash fingerprints. Not SQL-expressible in the oracle
  * (driver records rows-only checks); correctness is covered by
  * ScalaTest against the exact-Jaccard results of q31.
  *
  * Scale design: these are the 100 TB paths. Exact pairwise Jaccard
  * (q31) is quadratic in cluster size; MinHash banding turns it into
  * an equi-join on (band, signature) buckets — shuffle volume is
  * O(docs × bands), independent of pair count. All hashing uses
  * xxhash64 (codegen'd built-in); no UDFs.
  */
object Sketches {

  private def t(s: SparkSession, d: String, n: String) = Tables.load(s, d, n)

  // Deterministic MinHash permutation parameters: h_i(x) = (a_i·x + b_i) mod P
  // over 31-bit hash values (products stay < 2^62: no overflow).
  final val P = 2147483647L // 2^31 − 1
  final val NumHashes = 32
  final val BandRows = 4 // 8 bands × 4 rows: ~0.98 recall at J=0.8
  private val seeds: Seq[(Long, Long)] = {
    // LCG-derived constants, fixed seed — stable across runs/clusters.
    var s = 42L
    def next(): Long = { s = (s * 6364136223846793005L + 1442695040888963407L) & Long.MaxValue; s }
    (0 until NumHashes).map(_ => ((next() % (P - 1)) + 1, next() % P))
  }

  /** (doc_id, grams) where grams are distinct word-3-gram shingles. */
  private def shingled(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), split(lower(trim(col("text"))), "\\s+").as("toks"))
      .filter(size(col("toks")) >= 3)
      .select(col("doc_id"), array_distinct(expr(
        "transform(sequence(0, size(toks)-3), i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))"))
        .as("grams"))

  /** Append a `sig` array<long> MinHash signature column. */
  def withMinHashSignature(sh: DataFrame): DataFrame = {
    val hashed = sh.withColumn("hs",
      expr("transform(grams, g -> xxhash64(g) & 2147483647)"))
    val mins: Seq[Column] = seeds.map { case (a, b) =>
      expr(s"array_min(transform(hs, h -> ($a * h + $b) % $P))")
    }
    hashed.withColumn("sig", array(mins: _*)).drop("hs")
  }

  /** Exact Jaccard on the distinct-gram arrays of a candidate pair. */
  private val exactJaccard: Column =
    size(array_intersect(col("g1"), col("g2")))
      .cast("double") / size(array_union(col("g1"), col("g2")))

  /** MinHash+LSH near-dup pairs verified with exact Jaccard ≥ minJaccard. */
  def minHashPairs(docs: DataFrame, minJaccard: Double): DataFrame = {
    val sig = withMinHashSignature(shingled(docs)).persist()
    val nBands = NumHashes / BandRows
    val bandCols: Seq[Column] = (0 until nBands).map { j =>
      val parts = (0 until BandRows).map(r => s"sig[${j * BandRows + r}]")
      struct(lit(j).as("band"), expr(s"xxhash64(${parts.mkString(",")})").as("bh"))
    }
    val buckets = sig.select(col("doc_id"), col("grams"),
        explode(array(bandCols: _*)).as("bk"))
      .select(col("doc_id"), col("grams"), col("bk.band"), col("bk.bh"))
    val a = buckets.select(col("band"), col("bh"),
      col("doc_id").as("doc1"), col("grams").as("g1"))
    val b = buckets.select(col("band"), col("bh"),
      col("doc_id").as("doc2"), col("grams").as("g2"))
    a.join(b, Seq("band", "bh"))
      .filter(col("doc1") < col("doc2"))
      .select(col("doc1"), col("doc2"), col("g1"), col("g2"))
      .dropDuplicates("doc1", "doc2")
      .withColumn("jaccard", exactJaccard)
      .filter(col("jaccard") >= minJaccard)
      .select(col("doc1"), col("doc2"), round(col("jaccard"), 6).as("jaccard"))
      .orderBy(col("doc1"), col("doc2"))
  }

  /** 64-bit SimHash over (duplicated) whitespace tokens. */
  def simHash(docs: DataFrame): DataFrame = {
    val tok = docs
      .select(col("doc_id"), explode(split(lower(trim(col("text"))), "\\s+")).as("tk"))
      .withColumn("h", xxhash64(col("tk")))
    val bitSums: Seq[Column] = (0 until 64).map { b =>
      sum(when(shiftright(col("h"), b).bitwiseAND(lit(1L)) === 1L, 1)
        .otherwise(-1)).as(s"b$b")
    }
    val agg = tok.groupBy(col("doc_id")).agg(bitSums.head, bitSums.tail: _*)
    val bits: Seq[Column] = (0 until 64).map { b =>
      when(col(s"b$b") > 0, lit(1L << b)).otherwise(lit(0L))
    }
    agg.select(col("doc_id"), bits.reduce(_.bitwiseOR(_)).as("simhash"))
  }

  /** SimHash near-dup pairs: LSH on 4×16-bit bands, verified by exact
    * Hamming distance ≤ maxHamming (bit_count is codegen'd). */
  def simHashPairs(docs: DataFrame, maxHamming: Int): DataFrame = {
    val sh = simHash(docs)
    val banded = sh.select(col("doc_id"), col("simhash"), explode(array(
      (0 until 4).map(j => struct(lit(j).as("band"),
        shiftright(col("simhash"), j * 16).bitwiseAND(lit(0xffffL)).as("bh"))): _*)).as("bk"))
      .select(col("doc_id"), col("simhash"), col("bk.band"), col("bk.bh"))
    val a = banded.select(col("band"), col("bh"),
      col("doc_id").as("doc1"), col("simhash").as("h1"))
    val b = banded.select(col("band"), col("bh"),
      col("doc_id").as("doc2"), col("simhash").as("h2"))
    a.join(b, Seq("band", "bh")).filter(col("doc1") < col("doc2"))
      .dropDuplicates("doc1", "doc2")
      .withColumn("hamming", bit_count(col("h1").bitwiseXOR(col("h2"))))
      .filter(col("hamming") <= maxHamming)
      .select(col("doc1"), col("doc2"), col("hamming"))
      .orderBy(col("doc1"), col("doc2"))
  }

  val queries: Seq[QueryDef] = Seq(
    QueryDef.rowsOnly("q35_minhash_lsh") { (s, d) =>
      minHashPairs(t(s, d, "documents"), 0.8)
    },
    QueryDef.rowsOnly("q36_simhash") { (s, d) =>
      simHash(t(s, d, "documents")).orderBy(col("doc_id"))
    },
    QueryDef.rowsOnly("q37_fingerprint") { (s, d) =>
      GraftFunctions.register(s)
      t(s, d, "documents")
        .selectExpr("doc_id", "rolling_hash(text) AS fp",
          "rolling_hash(lower(trim(text))) AS fp_normalized")
        .orderBy(col("doc_id"))
    })
}
