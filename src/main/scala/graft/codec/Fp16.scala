package graft.codec

/** IEEE binary16 and bfloat16 bit conversions.
  *
  * JDK 17 lacks `Float.float16ToFloat` (JDK 20+), so these are hand ports
  * of the public fp16 bit algorithms the reference uses
  * (libs/fp16/fp16.h:33 `fp16_ieee_to_fp32_bits`) and the bf16 truncation /
  * round-to-nearest-even conversion (distance-cpu.h:100-108).
  */
object Fp16 {

  /** binary16 bits (in the low 16 bits of `h`) → float. */
  def f16ToFloat(h: Int): Float = {
    val bits = h & 0xffff
    val sign = (bits & 0x8000) << 16
    val exp = (bits >>> 10) & 0x1f
    val mant = bits & 0x3ff
    if (exp == 0x1f) { // Inf / NaN
      java.lang.Float.intBitsToFloat(sign | 0x7f800000 | (mant << 13))
    } else if (exp == 0) {
      if (mant == 0) java.lang.Float.intBitsToFloat(sign) // ±0
      else {
        // subnormal: v = mant × 2^-24; normalize with k shifts -> exp 113-k
        var m = mant
        var k = 0
        while ((m & 0x400) == 0) { m <<= 1; k += 1 }
        m &= 0x3ff
        val fexp = 113 - k
        java.lang.Float.intBitsToFloat(sign | (fexp << 23) | (m << 13))
      }
    } else {
      java.lang.Float.intBitsToFloat(sign | ((exp + (127 - 15)) << 23) | (mant << 13))
    }
  }

  /** float → binary16 bits (round-to-nearest-even, with overflow→Inf). */
  def floatToF16(f: Float): Short = {
    val bits = java.lang.Float.floatToRawIntBits(f)
    val sign = (bits >>> 16) & 0x8000
    var v = bits & 0x7fffffff
    if (v >= 0x7f800000) { // Inf/NaN
      val mant = if (v > 0x7f800000) 0x200 | ((v >> 13) & 0x3ff) else 0
      return (sign | 0x7c00 | mant).toShort
    }
    if (v >= 0x477ff000) return (sign | 0x7c00).toShort // overflow → Inf
    if (v < 0x38800000) {
      // subnormal half or zero: code = round(m / 2^(126-e)) with RNE
      if (v < 0x33000000) return sign.toShort // underflow → ±0
      val s = 126 - (v >>> 23) // in [14, 24] given the guards above
      val m = (v & 0x7fffff) | 0x800000
      val shifted = m >>> s
      val rem = m & ((1 << s) - 1)
      val half = 1 << (s - 1)
      var r = shifted
      if (rem > half || (rem == half && (shifted & 1) == 1)) r += 1
      return (sign | r).toShort
    }
    val exp = ((v >>> 23) - 127 + 15) << 10
    val mant = (v >>> 13) & 0x3ff
    val rem = v & 0x1fff
    var r = sign | exp | mant
    if (rem > 0x1000 || (rem == 0x1000 && (mant & 1) == 1)) r += 1
    r.toShort
  }

  /** bfloat16 bits → float: top 16 bits of binary32 (distance-cpu.h:100-102). */
  def bf16ToFloat(h: Int): Float =
    java.lang.Float.intBitsToFloat((h & 0xffff) << 16)

  /** float → bfloat16 with round-to-nearest-even (distance-cpu.h:103-108). */
  def floatToBf16(f: Float): Short = {
    val bits = java.lang.Float.floatToRawIntBits(f)
    if ((bits & 0x7fffffff) > 0x7f800000) return ((bits >>> 16) | 0x0040).toShort // NaN: keep quiet
    val lsb = (bits >>> 16) & 1
    ((bits + 0x7fff + lsb) >>> 16).toShort
  }
}
