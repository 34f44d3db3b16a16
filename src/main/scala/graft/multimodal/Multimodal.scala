package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal columns for the training-data pipeline: media ride
  * through the engine as opaque `binary` columns with typed metadata
  * (mime, byte size), and decode/feature-extraction runs as batched
  * per-partition transforms.
  *
  * The container has no image/audio libraries, so the DECODE KERNELS
  * ARE DETERMINISTIC STUBS (clearly marked below) — everything around
  * them is real and load-bearing at 100 TB: the binary column schema,
  * magic-byte mime sniffing as codegen'd expressions inside the scan
  * projection, and the mapPartitions batch shape (one model/decoder
  * instance per partition, rows streamed through it — the Scala
  * equivalent of `mapInPandas` batching; swap [[FeatureStub.decode]]
  * for a real JNI/ONNX call and nothing else changes).
  */
object Multimodal {

  /** Magic-byte mime sniff — pure scan-side expression (pushdown-safe,
    * reads only the first bytes of the payload). */
  def sniffMime(payload: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    def magic(bytes: Int*) = lit(bytes.map(_.toByte).toArray)
    when(substring(payload, 1, 4) === magic(0x89, 'P', 'N', 'G'), "image/png")
      .when(substring(payload, 1, 3) === magic(0xFF, 0xD8, 0xFF), "image/jpeg")
      .when(substring(payload, 1, 4) === magic('R', 'I', 'F', 'F'), "audio/wav")
      .when(substring(payload, 1, 4) === magic(0x1A, 0x45, 0xDF, 0xA3), "video/webm")
      .otherwise("application/octet-stream")
  }

  final case class MediaRow(doc_id: Long, payload: Array[Byte])
  final case class FeatureRow(doc_id: Long, width: Int, height: Int,
      features: Seq[Float])

  /** ======== STUB (deterministic fake; no media libs in-container) ====
    * Stands in for an image/audio decode + embed kernel. Width/height
    * derive from payload length, features from leading bytes — stable
    * across runs so tests and oracles can pin the output. A real
    * deployment replaces ONLY this function body. */
  object FeatureStub {
    final val Dim = 8
    def decode(payload: Array[Byte]): (Int, Int, Array[Float]) = {
      val n = payload.length
      val w = 16 + (n % 64); val h = 16 + ((n / 64) % 64)
      val feats = Array.tabulate(Dim) { i =>
        if (i < n) (payload(i) & 0xff) / 255.0f else 0.0f
      }
      (w, h, feats)
    }
  }

  /** Batched decode/feature extraction: one kernel instance per
    * partition, rows streamed — the `mapInPandas` batch shape in Scala.
    * Partitioning, schema, and laziness are the real 100 TB plumbing.
    */
  def extractFeatures(ds: Dataset[MediaRow]): Dataset[FeatureRow] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { rows =>
      // per-partition init site: a real kernel loads its model here once
      rows.map { r =>
        val (w, h, f) = FeatureStub.decode(r.payload)
        FeatureRow(r.doc_id, w, h, f.toSeq)
      }
    }
  }

  /** Frame/segment sampling for video/audio payloads: deterministic
    * stride over the byte stream standing in for frame boundaries —
    * again, the distribution plumbing (explode → one row per sample)
    * is the real part. */
  def sampleFrames(df: DataFrame, payloadCol: String, nFrames: Int): DataFrame =
    df.withColumn("frame_no", explode(sequence(lit(0), lit(nFrames - 1))))
      // widen before the multiply: frame_no · len overflows Int32 on a
      // half-GB video payload
      .withColumn("frame_off",
        (col("frame_no").cast("long") *
          greatest(octet_length(col(payloadCol)), lit(1)).cast("long")
          / nFrames).cast("long"))
      .withColumn("frame",
        expr(s"substring($payloadCol, frame_off + 1, 16)"))
}
