package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video payloads ride as opaque
  * `binary` columns with a typed metadata struct; decode / feature-extract /
  * frame-sample run as `mapPartitions` stages over Arrow-sized batches.
  *
  * The container has no image/audio codecs, so `FakeCodec` below is a
  * clearly-marked deterministic stand-in for the decode step — the
  * Spark-side contract (schema, partitioning, batch shape, null handling)
  * is real and tested; swapping in a true codec changes only the two
  * functions inside `FakeCodec`.
  */
object Multimodal {

  val MediaMetaType: StructType = StructType(Seq(
    StructField("media_type", StringType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("n_frames", IntegerType, nullable = false),
    StructField("byte_len", LongType, nullable = false)
  ))

  /** STUB decode: a real implementation would parse the container header
    * (JPEG/PNG/WAV/MP4). This deterministic fake derives plausible metadata
    * purely from the payload bytes so tests are reproducible.
    */
  object FakeCodec {
    def probe(payload: Array[Byte], mediaType: String): (Int, Int, Int) = {
      val h = java.util.Arrays.hashCode(payload)
      val w = 64 + (math.abs(h) % 193)          // fake width
      val ht = 64 + (math.abs(h >> 8) % 129)    // fake height
      val frames = if (mediaType == "video") 1 + math.abs(h >> 16) % 32 else 1
      (w, ht, frames)
    }

    /** STUB feature extraction: a real one would decode pixels/samples.
      * Returns a fixed-width feature vector from byte statistics.
      */
    def features(payload: Array[Byte], dim: Int): Array[Float] = {
      val out = new Array[Float](dim)
      var i = 0
      while (i < payload.length) {
        out(i % dim) += (payload(i) & 0xff) / 255.0f
        i += 1
      }
      out
    }
  }

  /** Attach decoded metadata: binary + media_type → MediaMeta struct.
    * One mapPartitions pass; partition-local, no shuffle.
    */
  def withMetadata(df: DataFrame, payloadCol: String, mediaTypeCol: String): DataFrame = {
    val schema = StructType(df.schema.fields :+ StructField("meta", MediaMetaType, nullable = true))
    val pIdx = df.schema.fieldIndex(payloadCol)
    val tIdx = df.schema.fieldIndex(mediaTypeCol)
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { rows =>
      rows.map { r =>
        if (r.isNullAt(pIdx)) Row.fromSeq(r.toSeq :+ null)
        else {
          val payload = r.getAs[Array[Byte]](pIdx)
          val mt = if (r.isNullAt(tIdx)) "unknown" else r.getString(tIdx)
          val (w, h, f) = FakeCodec.probe(payload, mt)
          Row.fromSeq(r.toSeq :+ Row(mt, w, h, f, payload.length.toLong))
        }
      }
    }(enc)
  }

  /** Feature extraction: binary payload → array<float> embedding column.
    * Batch shape mirrors a real vectorized decode (per-partition iterator).
    */
  def withFeatures(df: DataFrame, payloadCol: String, dim: Int = 16): DataFrame = {
    val featUdf = udf((b: Array[Byte]) => if (b == null) null else FakeCodec.features(b, dim))
    df.withColumn("features", featUdf(col(payloadCol)))
  }

  /** Frame sampling plan for video payloads: every `stride`-th frame index
    * up to n_frames — the Spark-side plumbing of a frame-sample stage
    * (real decoder would emit one row per sampled frame).
    */
  def sampleFrames(df: DataFrame, metaCol: String, stride: Int): DataFrame =
    df.withColumn("frame_idx",
        explode(sequence(lit(0), greatest(col(s"$metaCol.n_frames") - 1, lit(0)), lit(stride))))
}
