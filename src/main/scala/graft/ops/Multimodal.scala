package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads ride as opaque
  * `binary` columns with a typed metadata struct.
  *
  * Metadata extraction parses the real container headers (PNG/JPEG/GIF/WAV
  * — [[MediaCodec]]); only pixel/sample decode is out of scope (no codec
  * libraries in the runtime), so feature extraction operates on the payload
  * bytes themselves. Both stages are narrow per-row projections over just
  * the payload column — no Row-level serialization, no shuffle, and every
  * other column stays in the columnar batch untouched.
  */
object Multimodal {

  /** Attach parsed metadata: binary + declared media_type → meta struct
    * (media_type, width, height, n_frames, byte_len). A codegen'd narrow
    * projection over exactly two columns
    * ([[graft.expressions.MediaProbeExpr]]) — the full-corpus metadata
    * pass stays inside WholeStageCodegen with no per-row Row
    * serialization. Null payload → null meta; null declared type reads as
    * "unknown".
    */
  def withMetadata(df: DataFrame, payloadCol: String, mediaTypeCol: String): DataFrame =
    df.withColumn("meta", graft.functions.media_probe(
      col(payloadCol), coalesce(col(mediaTypeCol), lit("unknown"))))

  /** Byte-histogram feature extraction: payload → fixed-width
    * `array<float>` with out[i % dim] += byte/256. The 1/256 scaling keeps
    * every lane an exact binary fraction (exact in float while a lane sum
    * stays < 2^16), so results are bit-reproducible and restatable in SQL.
    * A pixel-level featurizer would decode first; byte statistics are the
    * container-agnostic stand-in with the same schema/partitioning shape.
    * A native codegen'd expression ([[graft.expressions.ByteHistogram]]),
    * so the featurizer stays inside WholeStageCodegen; null payload → null
    * features.
    */
  def withFeatures(df: DataFrame, payloadCol: String, dim: Int = 16): DataFrame =
    df.withColumn("features", graft.functions.byte_histogram(col(payloadCol), dim))

  /** REAL sample decode for audio payloads: 16-bit PCM WAV → exact
    * integer sample statistics struct (n_samples, sum_abs, max_abs,
    * zero_cross) via the codegen'd [[graft.expressions.PcmStatsExpr]] —
    * the decode stage [[withFeatures]]' byte histogram stood in for.
    * Undecodable payloads → null struct.
    */
  def withPcmStats(df: DataFrame, payloadCol: String): DataFrame =
    df.withColumn("pcm", graft.functions.pcm_stats(col(payloadCol)))

  /** REAL pixel decode for image payloads: 8-bit gray/RGB/RGBA PNG →
    * zlib inflate + five-filter scanline reconstruction + exact
    * per-channel sums ([[graft.expressions.PngPixelStatsExpr]]).
    * Undecodable payloads → null struct.
    */
  def withPixelStats(df: DataFrame, payloadCol: String): DataFrame =
    df.withColumn("px", graft.functions.png_pixel_stats(col(payloadCol)))

  /** Frame sampling plan for audio/video payloads: every `stride`-th frame
    * index up to n_frames — one row per sampled frame (a real decoder
    * slots into the per-frame rows this stage emits). A payload with
    * n_frames = 0 contributes ZERO rows: the sequence is guarded by
    * `when(n_frames > 0, ...)` and `explode` drops the null, so no phantom
    * frame_idx=0 row exists for frameless payloads.
    */
  def sampleFrames(df: DataFrame, metaCol: String, stride: Int): DataFrame =
    df.withColumn("frame_idx",
        explode(when(col(s"$metaCol.n_frames") > 0,
          sequence(lit(0), col(s"$metaCol.n_frames") - 1, lit(stride)))))
}
