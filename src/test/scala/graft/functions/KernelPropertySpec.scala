package graft.functions

import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.LongType
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the codegen kernels, run directly against their
  * static JVM entry points (no Spark session, no job per case): each
  * kernel must agree with an independently-written reference
  * implementation on randomized inputs, plus hold the algebraic
  * identities the query plans rely on (MinHash mergeability, sorted-
  * merge vs set semantics, Mersenne mulmod vs BigInt arithmetic).
  * Seeded, so a failure reproduces. */
class KernelPropertySpec extends AnyFunSuite {

  private def check(name: String, p: Prop): Unit = {
    val params = SCTest.Parameters.default
      .withMinSuccessfulTests(200)
      .withInitialSeed(Seed(42L))
    val res = SCTest.check(params, p)
    assert(res.passed, s"$name: ${res.status}")
  }

  private def utf8Array(xs: Seq[String]) =
    new GenericArrayData(xs.map(UTF8String.fromString).toArray[Any])
  private def longArray(xs: Seq[Long]) =
    new GenericArrayData(xs.toArray[Any])
  private def floatArray(xs: Seq[Float]) =
    new GenericArrayData(xs.toArray[Any])

  private val word = Gen.chooseNum(0, 8).flatMap(n =>
    Gen.stringOfN(n, Gen.frequency(8 -> Gen.alphaNumChar,
      1 -> Gen.const('√'), 1 -> Gen.const('"'))))

  test("sorted_overlap == set-intersection size; nulls-last suffix ignored") {
    val strs = Gen.listOf(word)
    check("overlap-str", Prop.forAll(strs, strs) { (a, b) =>
      val sa = a.distinct.map(UTF8String.fromString)
        .sortWith(_.compareTo(_) < 0)
      val sb = b.distinct.map(UTF8String.fromString)
        .sortWith(_.compareTo(_) < 0)
      val want = (a.distinct.toSet intersect b.distinct.toSet).size
      val got = SortedOverlap.count(
        new GenericArrayData(sa.toArray[Any]),
        new GenericArrayData(sb.toArray[Any]))
      // contract: array_sort places nulls LAST; a null suffix must not
      // change the count
      val gotWithNulls = SortedOverlap.count(
        new GenericArrayData((sa :+ null).toArray[Any]),
        new GenericArrayData(sb.toArray[Any]))
      got == want && gotWithNulls == want
    })
    val longs = Gen.listOf(Gen.chooseNum(Long.MinValue / 2, Long.MaxValue / 2))
    check("overlap-long", Prop.forAll(longs, longs) { (a, b) =>
      val want = (a.toSet intersect b.toSet).size
      SortedOverlap.countLong(
        longArray(a.distinct.sorted), longArray(b.distinct.sorted)) == want
    })
  }

  test("rolling_hash Mersenne mulmod == BigInt polynomial fold") {
    val M = BigInt(RollingHash.Mod)
    def ref(bytes: Array[Byte]): Long =
      bytes.foldLeft(BigInt(0))((h, b) =>
        (h * RollingHash.Base + (b & 0xff)) % M).toLong
    check("rolling-bytes", Prop.forAll(
      Gen.listOf(Gen.chooseNum(Byte.MinValue, Byte.MaxValue))) { bs =>
      RollingHash.hashBytes(bs.toArray) == ref(bs.toArray)
    })
    check("rolling-utf8", Prop.forAll(Gen.listOf(word).map(_.mkString(" "))) {
      s => RollingHash.hashBytes(s.getBytes("UTF-8")) ==
        ref(s.getBytes("UTF-8"))
    })
  }

  test("minhash_sig == BigInt reference and is mergeable (min of parts)") {
    def ref(grams: Seq[String]): Array[Long] = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val out = Array.fill(MinHashSig.NumHashes)(Long.MaxValue)
      grams.foreach { g =>
        val hex = md.digest(g.getBytes("UTF-8"))
          .map("%02x".format(_)).mkString.take(15)
        val h = (BigInt(hex, 16) mod BigInt(2147483648L)).toLong
        MinHashSig.seeds.zipWithIndex.foreach { case ((a, b), i) =>
          val cand = ((BigInt(a) * h + b) mod BigInt(MinHashSig.P)).toLong
          if (cand < out(i)) out(i) = cand
        }
      }
      out
    }
    val grams = Gen.nonEmptyListOf(word)
    check("minhash-ref", Prop.forAll(grams) { gs =>
      MinHashSig.sig(utf8Array(gs)).toSeq == ref(gs).toSeq
    })
    // mergeability — the property LSH banding and the streaming
    // incremental fold both depend on
    check("minhash-merge", Prop.forAll(grams, grams) { (a, b) =>
      val merged = MinHashSig.sig(utf8Array(a ++ b)).toSeq
      val partwise = MinHashSig.sig(utf8Array(a)).toSeq
        .zip(MinHashSig.sig(utf8Array(b)).toSeq).map(t => t._1 min t._2)
      merged == partwise
    })
  }

  test("cosine_sim == sequential double reference; unit and zero laws") {
    val vec = Gen.listOfN(16, Gen.chooseNum(-100f, 100f))
    def ref(x: Seq[Float], y: Seq[Float]): Double = {
      val n = math.min(x.length, y.length)
      var dot = 0.0; var nx = 0.0; var ny = 0.0
      for (i <- 0 until n) {
        dot += x(i).toDouble * y(i); nx += x(i).toDouble * x(i)
        ny += y(i).toDouble * y(i)
      }
      if (nx == 0.0 || ny == 0.0) 0.0 else dot / (math.sqrt(nx) * math.sqrt(ny))
    }
    val cos = CosineSimilarity(null, null)
    check("cosine-ref", Prop.forAll(vec, vec) { (x, y) =>
      cos.nullSafeEval(floatArray(x), floatArray(y)) == ref(x, y)
    })
    check("cosine-laws", Prop.forAll(vec) { x =>
      val self = cos.nullSafeEval(floatArray(x), floatArray(x))
        .asInstanceOf[Double]
      val zero = cos.nullSafeEval(floatArray(x),
        floatArray(Seq.fill(x.length)(0f))).asInstanceOf[Double]
      (x.forall(_ == 0f) || math.abs(self - 1.0) < 1e-9) && zero == 0.0
    })
  }

  test("all_pairs == index-ordered combinations") {
    check("all-pairs", Prop.forAll(
      Gen.chooseNum(0, 40).flatMap(n =>
        Gen.listOfN(n, Gen.chooseNum(-1000L, 1000L)))) { xs =>
      val got = AllPairs.expand(longArray(xs), LongType)
      val pairs = (0 until got.numElements()).map { k =>
        val r = got.get(k, null).asInstanceOf[GenericInternalRow]
        (r.getLong(0), r.getLong(1))
      }
      val want = for {
        i <- xs.indices; j <- (i + 1) until xs.length
      } yield (xs(i), xs(j))
      pairs == want
    })
  }

  test("srp_band_codes == naive sign-projection reference") {
    def ref(x: Seq[Float]): Array[Long] = {
      val q = Array.tabulate(SrpSketch.Dims) { j =>
        if (j >= x.length) 0L
        else {
          val v = x(j).toDouble * SrpSketch.QuantScale
          (if (v >= 0) math.floor(v + 0.5) else math.ceil(v - 0.5)).toLong
        }
      }
      val out = new Array[Long](SrpSketch.Bands)
      for (p <- 0 until SrpSketch.Planes) {
        val dot = (0 until SrpSketch.Dims)
          .map(k => BigInt(SrpSketch.signs(p)(k)) * q(k)).sum
        if (dot >= 0) out(p / SrpSketch.BandBits) |=
          1L << (p % SrpSketch.BandBits)
      }
      out
    }
    val vec = Gen.chooseNum(0, SrpSketch.Dims)
      .flatMap(n => Gen.listOfN(n, Gen.chooseNum(-10f, 10f)))
    check("srp-ref", Prop.forAll(vec) { x =>
      SrpSketch.codes(floatArray(x)).toSeq == ref(x).toSeq
    })
  }

  test("z_interleave16 == bit-by-bit reference; locality order law") {
    def ref(x: Long, y: Long): Long =
      (0 until 16).foldLeft(0L) { (z, i) =>
        z | (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
      }
    val dim = Gen.chooseNum(0L, 65535L)
    check("z-ref", Prop.forAll(dim, dim) { (x, y) =>
      ZInterleave16.interleave(x, y) == ref(x, y)
    })
    // the property file-skipping relies on: within one top-4-bit tile,
    // both dims stay inside the tile's quadrant bounds
    check("z-tile", Prop.forAll(dim, dim) { (x, y) =>
      val tile = ZInterleave16.interleave(x, y) >> 28
      // tile bits are [y15, x15, y14, x14] — each tile is a quadrant
      // bounding BOTH dims' top bits
      val expTile = (((y >> 15) & 1) << 3) | (((x >> 15) & 1) << 2) |
        (((y >> 14) & 1) << 1) | ((x >> 14) & 1)
      tile == expTile
    })
    intercept[IllegalArgumentException](ZInterleave16.interleave(65536L, 0L))
    intercept[IllegalArgumentException](ZInterleave16.interleave(0L, -1L))
  }
}
