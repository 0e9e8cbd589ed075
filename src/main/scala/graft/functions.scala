package graft

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.GraftColumnShim
import org.apache.spark.sql.functions.{lit, typedlit}

import graft.expressions._

/** Column-level API + SQL registration — the engine's equivalent of the
  * reference's scalar-function surface (vector_version/backend/as_*,
  * sqlite-vector.c:2545-2597).
  */
object functions {

  val Version = "0.9.23-spark" // tracks the reference version (sqlite-vector.h:27)

  private def col(e: Expression): Column = GraftColumnShim.column(e)
  private def expr(c: Column): Expression = GraftColumnShim.expression(c)

  /** Probe vector as an `array<float>` literal column. */
  def vectorLit(v: Array[Float]): Column = typedlit(v.toSeq)

  /** Task count for a partitioned store write: the session's shuffle
    * parallelism, pinned EXPLICITLY on the pre-write `repartition` so
    * AQE's byte-based coalescing cannot fold a many-directory
    * `partitionBy` write onto one or two tasks (a small store still
    * opens one parquet writer per partition directory — measured 2
    * tasks × ~128 sequential file creations each on the 256-bucket LSH
    * store, the whole cost of its append row). Scale-adaptive: the
    * value is the deployment's own `spark.sql.shuffle.partitions`, not
    * a constant.
    */
  def writeParallelism(spark: SparkSession): Int =
    spark.sessionState.conf.numShufflePartitions

  def vector_distance(a: Column, b: Column, metric: String): Column =
    col(VectorDistance(expr(a), expr(b), Metric.parse(metric)))

  def vector_distance_packed(a: Column, b: Column, metric: String, elemType: String): Column =
    col(PackedVectorDistance(expr(a), expr(b), Metric.parse(metric), ElemType.parse(elemType)))

  def quantize_codes(v: Column, p: QuantParams): Column =
    col(QuantizeCodes(expr(v), p.scale, p.offset, p.qType == QType.U8))

  def code_distance(a: Column, b: Column, metric: String, qType: QType): Column =
    col(CodeDistance(expr(a), expr(b), Metric.parse(metric), signed = qType == QType.I8))

  def code_sum(c: Column, qType: QType): Column =
    col(CodeSum(expr(c), signed = qType == QType.I8))

  def pack_vector(v: Column, elemType: String): Column =
    col(PackVector(expr(v), ElemType.parse(elemType)))

  def array_min_max(v: Column): Column = col(ArrayMinMax(expr(v)))

  /** Result-identical drop-in for `round(c, scale)` on doubles, minus the
    * per-row BigDecimal/`Double.toString` cost — see
    * [[graft.expressions.FastRound]]. Use in pair-dense plans where a
    * value is rounded per candidate, not per output row.
    */
  def fast_round(c: Column, scale: Int = 6): Column = col(FastRound(expr(c), scale))

  def shingle_hashes(text: Column, n: Int): Column = col(ShingleHashes(expr(text), n))

  /** CDC boundary positions over ASCII-cleaned text; see
    * [[graft.expressions.CdcBoundaries]].
    */
  def cdc_boundaries(text: Column, window: Int, divisor: Int): Column =
    col(CdcBoundaries(expr(text), window, divisor))

  def byte_histogram(payload: Column, dim: Int): Column = col(ByteHistogram(expr(payload), dim))

  /** ⟨x−μ, v⟩ against constant vectors — see [[graft.expressions.CenteredDot]]. */
  def centered_dot(vec: Column, mu: Array[Double], v: Array[Double]): Column =
    col(CenteredDot(expr(vec), mu, v))

  /** Per-row PCA lane contributions — see [[graft.expressions.PcaLaneTerms]]. */
  def pca_lane_terms(vec: Column, mu: Array[Double], v: Array[Double]): Column =
    col(PcaLaneTerms(expr(vec), mu, v))

  def simhash64(tokens: Column): Column = col(SimHash64(expr(tokens)))

  /** SQL-restatable 61-bit string hash — the narrow shuffle key for
    * string-keyed grouping (line dedup); see [[graft.expressions.StringHash61]].
    */
  def string_hash61(s: Column): Column = col(StringHash61(expr(s)))

  /** Unicode NFC canonical composition; see [[graft.expressions.NfcNormalize]]. */
  def nfc_normalize(s: Column): Column = col(NfcNormalize(expr(s)))

  /** Sign-bit binary quantization: `array<float>` → packed `array<long>`
    * bit signature (1 bit/dim); see [[graft.expressions.SignBits]].
    */
  def sign_bits(v: Column, dim: Int): Column = col(SignBits(expr(v), dim))

  /** Hamming distance between two [[sign_bits]] signatures. */
  def hamming_distance(a: Column, b: Column): Column =
    col(HammingDistance(expr(a), expr(b)))

  /** Misra-Gries heavy-hitters aggregate (≤ k counters, deterministic
    * n/(k+1) undercount bound); see [[graft.expressions.FreqItemsSketch]].
    */
  def freq_items_sketch(item: Column, k: Int): Column =
    col(FreqItemsSketch(expr(item), k).toAggregateExpression())

  /** REAL 16-bit PCM decode of a RIFF/WAVE payload → exact integer stats
    * struct; see [[graft.expressions.PcmStatsExpr]].
    */
  def pcm_stats(payload: Column): Column = col(PcmStatsExpr(expr(payload)))

  /** REAL PNG pixel decode (inflate + five-filter reconstruction) → exact
    * per-channel sums struct; see [[graft.expressions.PngPixelStatsExpr]].
    */
  def png_pixel_stats(payload: Column): Column = col(PngPixelStatsExpr(expr(payload)))

  /** 63-bit perceptual dHash over decoded PNG pixels — see
    * [[graft.expressions.PngDhashExpr]].
    */
  def png_dhash(payload: Column): Column = col(PngDhashExpr(expr(payload)))

  /** Exact luma stats over a REAL baseline-JPEG decode (Huffman + islow
    * IDCT, luma-only); see [[graft.expressions.JpegLumaStatsExpr]].
    */
  def jpeg_luma_stats(payload: Column): Column = col(JpegLumaStatsExpr(expr(payload)))

  /** Perceptual 63-bit dHash over decoded JPEG luma — one hash space with
    * [[png_dhash]]; see [[graft.expressions.JpegDhashExpr]].
    */
  def jpeg_dhash(payload: Column): Column = col(JpegDhashExpr(expr(payload)))

  /** Energy-envelope audio fingerprint over decoded PCM16 — see
    * [[graft.expressions.PcmFingerprintExpr]].
    */
  def pcm_fingerprint(payload: Column, window: Int = 8): Column =
    col(PcmFingerprintExpr(expr(payload), window))

  /** GIF frame count + total delay via a real block walk — see
    * [[graft.expressions.GifFramesExpr]].
    */
  def gif_frames(payload: Column): Column = col(GifFramesExpr(expr(payload)))

  /** Container-header metadata struct for a multimodal binary payload —
    * see [[graft.expressions.MediaProbeExpr]].
    */
  def media_probe(payload: Column, declaredType: Column): Column =
    col(MediaProbeExpr(expr(payload), expr(declaredType)))

  /** Exact integral division over BIGINT columns (the SQL `div`
    * operator; DuckDB `//`) — the building block for decimal-exact
    * rational arithmetic in integer space, where `/` on longs would
    * detour through double and lose exactness past 2⁵³.
    */
  def long_div(a: Column, b: Column): Column =
    col(org.apache.spark.sql.catalyst.expressions.IntegralDivide(expr(a), expr(b)))

  /** One BPE merge round over a symbol array; see
    * [[graft.expressions.BpeMerge]].
    */
  def bpe_merge(syms: Column, a: String, b: String): Column =
    col(BpeMerge(expr(syms), a, b))

  def sorted_intersect_count(a: Column, b: Column): Column =
    col(SortedIntersectCount(expr(a), expr(b)))

  def sig_match_count(a: Column, b: Column): Column =
    col(SigMatchCount(expr(a), expr(b)))

  def minhash_signature(shingleHashes: Column, numHashes: Int): Column =
    col(MinHashSignature(expr(shingleHashes), numHashes))

  def hyperplane_signature(v: Column, nBits: Int, dim: Int, seed: Long = 42L): Column =
    col(HyperplaneSignature(expr(v), nBits, dim, seed))

  def nearest_centroid(v: Column, centroids: Seq[Seq[Float]]): Column =
    col(NearestCentroid(expr(v), centroids))

  /** Johnson-Lindenstrauss Gaussian random projection to `outDim`
    * dimensions; see [[graft.expressions.RandomProjection]].
    */
  def random_projection(v: Column, outDim: Int, dim: Int, seed: Long = 42L): Column =
    col(RandomProjection(expr(v), outDim, dim, seed))

  /** Grouped top-k aggregate: smallest-k (distance, id) pairs per group,
    * bounded O(k) state per task (map-side combine) — the batch k-NN join
    * primitive; see [[graft.expressions.TopKPairs]].
    */
  def knn_topk(distance: Column, id: Column, k: Int): Column =
    col(TopKPairs(expr(distance), expr(id), k).toAggregateExpression())

  /** Bounded per-group DISTINCT top-k strings by (priority, value) — the
    * skew-proof `collect_set` with an exact over-cap flag; see
    * [[graft.expressions.TopKDistinctStrings]]. Returns
    * struct(kept array<string>, capped boolean).
    */
  def topk_distinct_strings(priority: Column, value: Column, k: Int): Column =
    col(TopKDistinctStrings(expr(priority), expr(value), k).toAggregateExpression())

  /** Per-group embedding centroid in exact (order-independent) fixed-point
    * arithmetic; see [[graft.expressions.VectorAvgFixed]].
    */
  def vector_avg(v: Column, dim: Int): Column =
    col(VectorAvgFixed(expr(v), dim).toAggregateExpression())

  def vector_as_f32(v: Column, dim: Int = -1): Column = col(ToVector(expr(v), ElemType.F32, dim))
  def vector_as_f16(v: Column, dim: Int = -1): Column = col(ToVector(expr(v), ElemType.F16, dim))
  def vector_as_bf16(v: Column, dim: Int = -1): Column = col(ToVector(expr(v), ElemType.BF16, dim))
  def vector_as_i8(v: Column, dim: Int = -1): Column = col(ToVector(expr(v), ElemType.I8, dim))
  def vector_as_u8(v: Column, dim: Int = -1): Column = col(ToVector(expr(v), ElemType.U8, dim))

  def vector_version(): Column = lit(Version)
  def vector_backend(): Column = lit(kernels.Distances.backend())

  /** Register the SQL surface so `spark.sql("... vector_distance(a, b, 'l2') ...")`
    * works — parity with the reference's CREATE FUNCTION registrations
    * (sqlite-vector.c:2581-2597).
    */
  def registerSql(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    def strArg(e: Expression, what: String): String = e match {
      case Literal(s, _) if s != null => s.toString
      case other => throw new IllegalArgumentException(s"$what must be a string literal, got $other")
    }
    reg.createOrReplaceTempFunction("vector_version",
      _ => Literal(org.apache.spark.unsafe.types.UTF8String.fromString(Version)), "scala_udf")
    reg.createOrReplaceTempFunction("vector_backend",
      _ => Literal(org.apache.spark.unsafe.types.UTF8String.fromString(kernels.Distances.backend())), "scala_udf")
    reg.createOrReplaceTempFunction("vector_distance", {
      case Seq(a, b) => VectorDistance(a, b, Metric.L2)
      case Seq(a, b, m) => VectorDistance(a, b, Metric.parse(strArg(m, "metric")))
      case args => throw new IllegalArgumentException(s"vector_distance expects 2-3 args, got ${args.size}")
    }, "scala_udf")
    def asFn(et: ElemType): Seq[Expression] => Expression = {
      case Seq(v) => ToVector(v, et)
      case Seq(v, Literal(d, _)) => ToVector(v, et, d.toString.toInt)
      case args => throw new IllegalArgumentException(s"vector_as_* expects 1-2 args, got ${args.size}")
    }
    reg.createOrReplaceTempFunction("string_hash61", {
      case Seq(s) => StringHash61(s)
      case args => throw new IllegalArgumentException(s"string_hash61 expects 1 arg, got ${args.size}")
    }, "scala_udf")
    reg.createOrReplaceTempFunction("nfc_normalize", {
      case Seq(s) => NfcNormalize(s)
      case args => throw new IllegalArgumentException(s"nfc_normalize expects 1 arg, got ${args.size}")
    }, "scala_udf")
    reg.createOrReplaceTempFunction("pcm_stats", {
      case Seq(p) => PcmStatsExpr(p)
      case args => throw new IllegalArgumentException(s"pcm_stats expects 1 arg, got ${args.size}")
    }, "scala_udf")
    reg.createOrReplaceTempFunction("png_dhash", {
      case Seq(p) => PngDhashExpr(p)
      case args => throw new IllegalArgumentException(s"png_dhash expects 1 arg, got ${args.size}")
    }, "scala_udf")
    reg.createOrReplaceTempFunction("gif_frames", {
      case Seq(p) => GifFramesExpr(p)
      case args => throw new IllegalArgumentException(s"gif_frames expects 1 arg, got ${args.size}")
    }, "scala_udf")
    reg.createOrReplaceTempFunction("media_probe", {
      case Seq(p, d) => MediaProbeExpr(p, d)
      case args => throw new IllegalArgumentException(s"media_probe expects 2 args, got ${args.size}")
    }, "scala_udf")
    // text-cleaning scalar surface: the column chains ARE the
    // registration (one implementation, two front doors)
    reg.createOrReplaceTempFunction("fix_mojibake", {
      case Seq(t) => GraftColumnShim.eagerExpression(ops.TextAnalysis.fixMojibake(col(t)))
      case args => throw new IllegalArgumentException(s"fix_mojibake expects 1 arg, got ${args.size}")
    }, "scala_udf")
    reg.createOrReplaceTempFunction("script_mix", {
      case Seq(t) => GraftColumnShim.eagerExpression(ops.TextAnalysis.scriptMix(col(t)))
      case args => throw new IllegalArgumentException(s"script_mix expects 1 arg, got ${args.size}")
    }, "scala_udf")
    reg.createOrReplaceTempFunction("card_redact", {
      case Seq(t) => GraftColumnShim.eagerExpression(ops.Curation.redactCards(col(t)))
      case args => throw new IllegalArgumentException(s"card_redact expects 1 arg, got ${args.size}")
    }, "scala_udf")
    reg.createOrReplaceTempFunction("pcm_fingerprint", {
      case Seq(p) => PcmFingerprintExpr(p, 8)
      case args => throw new IllegalArgumentException(s"pcm_fingerprint expects 1 arg, got ${args.size}")
    }, "scala_udf")
    reg.createOrReplaceTempFunction("png_pixel_stats", {
      case Seq(p) => PngPixelStatsExpr(p)
      case args => throw new IllegalArgumentException(s"png_pixel_stats expects 1 arg, got ${args.size}")
    }, "scala_udf")
    reg.createOrReplaceTempFunction("vector_as_f32", asFn(ElemType.F32), "scala_udf")
    reg.createOrReplaceTempFunction("vector_as_f16", asFn(ElemType.F16), "scala_udf")
    reg.createOrReplaceTempFunction("vector_as_bf16", asFn(ElemType.BF16), "scala_udf")
    reg.createOrReplaceTempFunction("vector_as_i8", asFn(ElemType.I8), "scala_udf")
    reg.createOrReplaceTempFunction("vector_as_u8", asFn(ElemType.U8), "scala_udf")
    def intArg(e: Expression, what: String): Int = e match {
      case Literal(v, _) if v != null => v.toString.toInt
      case other => throw new IllegalArgumentException(s"$what must be an integer literal, got $other")
    }
    // aggregate builders return the bare AggregateFunction — the analyzer
    // wraps it in an AggregateExpression like any built-in SQL aggregate
    reg.createOrReplaceTempFunction("knn_topk", {
      case Seq(d, id, k) => TopKPairs(d, id, intArg(k, "k"))
      case args => throw new IllegalArgumentException(s"knn_topk expects (distance, id, k), got ${args.size} args")
    }, "scala_udf")
    reg.createOrReplaceTempFunction("vector_avg", {
      case Seq(v, d) => VectorAvgFixed(v, intArg(d, "dim"))
      case args => throw new IllegalArgumentException(s"vector_avg expects (vec, dim), got ${args.size} args")
    }, "scala_udf")
    reg.createOrReplaceTempFunction("random_projection", {
      case Seq(v, o, d) => RandomProjection(v, intArg(o, "outDim"), intArg(d, "dim"), 42L)
      case Seq(v, o, d, sd) => RandomProjection(v, intArg(o, "outDim"), intArg(d, "dim"), intArg(sd, "seed").toLong)
      case args => throw new IllegalArgumentException(s"random_projection expects (vec, outDim, dim[, seed]), got ${args.size} args")
    }, "scala_udf")
    reg.createOrReplaceTempFunction("freq_items_sketch", {
      case Seq(item, k) => FreqItemsSketch(item, intArg(k, "k"))
      case args => throw new IllegalArgumentException(s"freq_items_sketch expects (item, k), got ${args.size} args")
    }, "scala_udf")
    reg.createOrReplaceTempFunction("sign_bits", {
      case Seq(v, d) => SignBits(v, intArg(d, "dim"))
      case args => throw new IllegalArgumentException(s"sign_bits expects (vec, dim), got ${args.size} args")
    }, "scala_udf")
    reg.createOrReplaceTempFunction("hamming_distance", {
      case Seq(a, b) => HammingDistance(a, b)
      case args => throw new IllegalArgumentException(s"hamming_distance expects (a, b), got ${args.size} args")
    }, "scala_udf")
  }
}
