package graft.multimodal

import graft.SparkTestSession
import graft.multimodal.Multimodal._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Multimodal plumbing: mime sniffing, batched feature extraction
  * (deterministic stub kernel), frame sampling shapes. */
class MultimodalSpec extends AnyFunSuite {

  private def df() = {
    val spark = SparkTestSession.spark
    import spark.implicits._
    Seq(
      (1L, Array[Byte](0x89.toByte, 'P', 'N', 'G', 10, 20)),
      (2L, Array[Byte](0xFF.toByte, 0xD8.toByte, 0xFF.toByte, 0)),
      (3L, "RIFFdata here".getBytes("UTF-8")),
      (4L, "plain text".getBytes("UTF-8"))).toDF("doc_id", "payload")
  }

  test("mime sniff from magic bytes") {
    val got = df().select(col("doc_id"), sniffMime(col("payload")).as("m"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "image/png", 2L -> "image/jpeg",
      3L -> "audio/wav", 4L -> "application/octet-stream"))
  }

  test("feature extraction is deterministic and batch-shaped") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    val out = extractFeatures(df().as[MediaRow]).collect()
      .map(r => r.doc_id -> r).toMap
    assert(out(1L).width == 16 + 6 % 64 && out(1L).height == 16)
    assert(out(1L).features.length == FeatureStub.Dim)
    assert(out(1L).features(0) == 137 / 255.0f)
    assert(out(2L).features(1) == 216 / 255.0f)
    // short payload zero-pads features
    assert(out(2L).features(5) == 0.0f)
    // rerun gives bit-identical features (stub is deterministic)
    val again = extractFeatures(df().as[MediaRow]).collect()
      .map(r => r.doc_id -> r.features).toMap
    assert(out.keySet.forall(k => again(k) == out(k).features))
  }

  test("frame sampling explodes n rows with in-range offsets") {
    val out = sampleFrames(df(), "payload", nFrames = 4)
      .select("doc_id", "frame_no", "frame_off", "frame").collect()
    assert(out.length == 16, "4 docs × 4 frames")
    out.foreach { r =>
      val off = r.getLong(2)
      assert(off >= 0 && off < math.max(1,
        df().filter(col("doc_id") === r.getLong(0)).head.getAs[Array[Byte]](1).length))
      assert(r.getAs[Array[Byte]](3) != null)
    }
  }
}
