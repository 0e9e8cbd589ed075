package graft.kernels

import graft.{QType, QuantParams}

/** Global min–max scalar quantization math, replicating
  * sqlite-vector.c:495-515 (q_round_u8/s8: half-away-from-zero rounding
  * with saturation, NaN→0, ±Inf→bounds) and :1258-1272 (AUTO qtype choice
  * + scale/offset formulas), including the empty-table degenerate config
  * (:1172-1178).
  */
object Quantize {

  /** AUTO resolution: any negative value → INT8 (symmetric), else UINT8
    * (asymmetric). sqlite-vector.c:1258-1261.
    */
  def resolveQType(qt: QType, hasNegative: Boolean): QType = qt match {
    case QType.Auto => if (hasNegative) QType.I8 else QType.U8
    case other      => other
  }

  /** scale/offset per sqlite-vector.c:1263-1272; empty input → (U8, 1, 0)
    * per :1172-1178.
    */
  def params(qt: QType, min: Double, max: Double, hasNegative: Boolean, rows: Long): QuantParams = {
    if (rows == 0) return QuantParams(QType.U8, 1.0, 0.0, 0L)
    val resolved = resolveQType(qt, hasNegative)
    resolved match {
      case QType.U8 =>
        // Deliberate divergence: for max==min the reference computes
        // 255/(max-min) = +Inf (no guard at sqlite-vector.c:1266), which
        // makes every constant-valued dataset quantize to garbage. We
        // substitute scale=1 (codes all 0 after offsetting); the DuckDB
        // oracle CTE guards identically, so the two stay consistent.
        val range = max - min
        QuantParams(QType.U8, if (range == 0.0) 1.0 else 255.0 / range, min, rows)
      case QType.I8 =>
        val absMax = math.max(math.abs(min), math.abs(max))
        QuantParams(QType.I8, if (absMax == 0.0) 1.0 else 127.0 / absMax, 0.0, rows)
      case QType.Auto => throw new IllegalStateException("unreachable")
    }
  }

  /** Exact decimal HALF_UP rounding of a double — the slow-but-exact half
    * of [[graft.expressions.FastRound]]; literally Spark's `Round`-on-
    * DoubleType semantics (`BigDecimal.valueOf` = shortest-repr decimal).
    */
  def roundHalfUp(x: Double, scale: Int): Double = {
    if (java.lang.Double.isNaN(x) || java.lang.Double.isInfinite(x)) x
    else java.math.BigDecimal.valueOf(x)
      .setScale(scale, java.math.RoundingMode.HALF_UP).doubleValue()
  }

  /** Half-away-from-zero round + saturate to [0,255]. sqlite-vector.c:495-505. */
  def roundU8(v: Double): Int = {
    if (v.isNaN) return 0
    val r = math.floor(math.abs(v) + 0.5) * math.signum(v)
    if (r <= 0.0) 0 else if (r >= 255.0) 255 else r.toInt
  }

  /** Half-away-from-zero round + saturate to [-128,127]. sqlite-vector.c:507-515. */
  def roundI8(v: Double): Int = {
    if (v.isNaN) return 0
    val r = math.floor(math.abs(v) + 0.5) * math.signum(v)
    if (r <= -128.0) -128 else if (r >= 127.0) 127 else r.toInt
  }

  /** Quantize one element: code = round((x − offset) × scale), saturated. */
  def code(x: Double, p: QuantParams): Int = p.qType match {
    case QType.U8 => roundU8((x - p.offset) * p.scale)
    case _        => roundI8((x - p.offset) * p.scale)
  }

  /** Quantize a whole vector into signed bytes (u8 codes stored with the
    * usual wrap; read back with `& 0xff`).
    */
  def codes(v: Array[Float], p: QuantParams): Array[Byte] = {
    val out = new Array[Byte](v.length)
    var i = 0
    while (i < v.length) { out(i) = code(v(i).toDouble, p).toByte; i += 1 }
    out
  }
}
