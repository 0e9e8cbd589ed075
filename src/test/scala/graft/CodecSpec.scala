package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.codec.{Fp16, VectorCodec}
import graft.kernels.Quantize

class CodecSpec extends AnyFunSuite {

  test("f16 round-trip: every finite half value survives encode(decode(bits))") {
    var bits = 0
    while (bits < 0x10000) {
      val f = Fp16.f16ToFloat(bits)
      if (!f.isNaN) {
        val back = Fp16.floatToF16(f) & 0xffff
        assert(back == bits, s"bits ${bits.toHexString} -> $f -> ${back.toHexString}")
      }
      bits += 1
    }
  }

  test("f16 known values (libs/fp16 semantics)") {
    assert(Fp16.f16ToFloat(0x3c00) == 1.0f)
    assert(Fp16.f16ToFloat(0xc000) == -2.0f)
    assert(Fp16.f16ToFloat(0x7c00) == Float.PositiveInfinity)
    assert(Fp16.f16ToFloat(0xfc00) == Float.NegativeInfinity)
    assert(Fp16.f16ToFloat(0x7e00).isNaN)
    assert(Fp16.f16ToFloat(0x0001) == 5.9604645e-8f) // smallest subnormal
    assert(Fp16.floatToF16(65504f) == 0x7bff.toShort) // max half
    assert(Fp16.floatToF16(65520f) == 0x7c00.toShort) // overflow -> Inf
  }

  test("bf16 round-trip for all finite bf16 values") {
    var bits = 0
    while (bits < 0x10000) {
      val f = Fp16.bf16ToFloat(bits)
      if (!f.isNaN) assert((Fp16.floatToBf16(f) & 0xffff) == bits)
      bits += 1
    }
  }

  test("bf16 encode uses round-to-nearest-even (distance-cpu.h:103-108)") {
    // 1.0 + 2^-8 is exactly between two bf16 values; RNE picks the even one
    val f = java.lang.Float.intBitsToFloat(0x3f808000)
    assert((Fp16.floatToBf16(f) & 0xffff) == 0x3f80)
  }

  test("pack/unpack round-trips for f32/i8/u8") {
    val rnd = new scala.util.Random(3)
    for (_ <- 1 to 50) {
      val v = Array.fill(17)(rnd.nextFloat() * 200f - 100f)
      assert(VectorCodec.unpack(VectorCodec.pack(v, ElemType.F32), ElemType.F32).sameElements(v))
    }
    val i8 = Array(-128f, -1f, 0f, 1f, 127f)
    assert(VectorCodec.unpack(VectorCodec.pack(i8, ElemType.I8), ElemType.I8).sameElements(i8))
    val u8 = Array(0f, 1f, 128f, 255f)
    assert(VectorCodec.unpack(VectorCodec.pack(u8, ElemType.U8), ElemType.U8).sameElements(u8))
  }

  test("JSON parser: trailing comma tolerated (sqlite-vector.c:1634-1635)") {
    assert(VectorCodec.parseJson("[0.1, 0.2, 0.3,]").sameElements(Array(0.1f, 0.2f, 0.3f)))
    assert(VectorCodec.parseJson("[]").isEmpty)
    assert(VectorCodec.parseJson(" [ 1 , 2 ] ").sameElements(Array(1f, 2f)))
  }

  test("JSON parser: malformed inputs rejected") {
    for (bad <- Seq("1,2", "[1,,2]", "[a]", "[1 2]", "[", "[1,2", "{}"))
      assertThrows[IllegalArgumentException](VectorCodec.parseJson(bad))
  }

  test("JSON parser: dimension check (sqlite-vector.c:1646-1649)") {
    assertThrows[IllegalArgumentException](VectorCodec.parseJson("[1,2,3]", expectDim = 4))
    assert(VectorCodec.parseJson("[1,2,3]", expectDim = 3).length == 3)
  }

  test("i8/u8 range checks (sqlite-vector.c:1601-1615)") {
    assertThrows[IllegalArgumentException](VectorCodec.checkRange(Array(-129f), ElemType.I8))
    assertThrows[IllegalArgumentException](VectorCodec.checkRange(Array(256f), ElemType.U8))
    assertThrows[IllegalArgumentException](VectorCodec.checkRange(Array(-1f), ElemType.U8))
    VectorCodec.checkRange(Array(-128f, 127f), ElemType.I8)
    VectorCodec.checkRange(Array(0f, 255f), ElemType.U8)
  }

  test("blob size checks (sqlite-vector.c:1663-1675)") {
    assertThrows[IllegalArgumentException](VectorCodec.checkBlob(new Array[Byte](7), ElemType.F32))
    assertThrows[IllegalArgumentException](VectorCodec.checkBlob(new Array[Byte](8), ElemType.F32, dim = 3))
    VectorCodec.checkBlob(new Array[Byte](12), ElemType.F32, dim = 3)
  }

  test("quantize rounding: half away from zero + saturation (sqlite-vector.c:495-515)") {
    assert(Quantize.roundI8(0.5) == 1)
    assert(Quantize.roundI8(-0.5) == -1)
    assert(Quantize.roundI8(127.6) == 127)
    assert(Quantize.roundI8(-200.0) == -128)
    assert(Quantize.roundI8(Double.NaN) == 0)
    assert(Quantize.roundI8(Double.PositiveInfinity) == 127)
    assert(Quantize.roundI8(Double.NegativeInfinity) == -128)
    assert(Quantize.roundU8(255.7) == 255)
    assert(Quantize.roundU8(-0.7) == 0)
    assert(Quantize.roundU8(0.5) == 1)
    assert(Quantize.roundU8(Double.NaN) == 0)
  }

  test("scale/offset formulas + AUTO qtype (sqlite-vector.c:1258-1272)") {
    // all positive -> UINT8 asymmetric
    val u = Quantize.params(QType.Auto, 1.0, 3.0, hasNegative = false, 10)
    assert(u.qType == QType.U8 && u.scale == 255.0 / 2.0 && u.offset == 1.0)
    // any negative -> INT8 symmetric
    val i = Quantize.params(QType.Auto, -2.0, 1.0, hasNegative = true, 10)
    assert(i.qType == QType.I8 && i.scale == 127.0 / 2.0 && i.offset == 0.0)
    // empty table degenerate (sqlite-vector.c:1172-1178)
    val e = Quantize.params(QType.Auto, 0, 0, hasNegative = false, 0)
    assert(e.qType == QType.U8 && e.scale == 1.0 && e.offset == 0.0)
  }

  test("option-string grammar (sqlite-vector.c:878-992)") {
    val c = VectorConfig.fromOptions("type=FLOAT16,dimension=384,distance=cosine,max_memory=2MB,unknown=zzz")
    assert(c.elemType == ElemType.F16 && c.dim == 384 && c.metric == Metric.Cosine)
    assert(c.maxMemory == 2L * 1024 * 1024)
    assertThrows[IllegalArgumentException](VectorConfig.fromOptions("type=FLOAT32")) // dim mandatory
  }

  // ---------- real sample/pixel decode ----------

  test("pcmStats decodes the PCM16 fixture exactly (RIFF walk + LE16 + stats)") {
    import graft.ops.MediaCodec
    for (seed <- Seq(0L, 7L, 123L); channels <- Seq(1, 2); frames <- Seq(0, 1, 64)) {
      val b = MediaCodec.wavPcmFixture(16000, channels, frames, seed)
      val n = frames * channels
      val samples = Array.tabulate(n)(i => (((seed * 31 + i * 17) % 4096) - 2048).toInt)
      val want = (
        n.toLong,
        samples.map(s => math.abs(s).toLong).sum,
        if (n == 0) 0L else samples.map(s => math.abs(s).toLong).max,
        (1 until n).count(i => (samples(i) < 0) != (samples(i - 1) < 0)).toLong)
      val got = MediaCodec.pcmStats(b).get
      assert((got.n_samples, got.sum_abs, got.max_abs, got.zero_cross) == want,
        s"seed=$seed ch=$channels frames=$frames")
    }
    // header-only fixture: declared-but-absent data decodes to zero samples
    assert(MediaCodec.pcmStats(MediaCodec.wavFixture(8000, 1, 50)).get.n_samples == 0)
    // non-WAV payloads refuse
    assert(MediaCodec.pcmStats(MediaCodec.jpegFixture(4, 4)).isEmpty)
    assert(MediaCodec.pcmStats(Array[Byte](1, 2, 3)).isEmpty)
  }

  test("pngPixelStats reverses all five scanline filters for gray/RGB/RGBA") {
    import graft.ops.MediaCodec
    for (filter <- 0 to 4; ch <- Seq(1, 3, 4)) {
      val (w, h, seed) = (5, 4, 42L)
      val b = MediaCodec.pngPixelFixture(w, h, seed, filter, ch)
      val got = MediaCodec.pngPixelStats(b).get
      val sums = new Array[Long](3)
      var maxPx = 0L
      for (y <- 0 until h; x <- 0 until w; c <- 0 until ch if c < 3) {
        val v = ((seed + 7 * x + 13 * y + 29 * c) % 256).toInt
        sums(if (ch == 1) 0 else c) += v
        maxPx = math.max(maxPx, v)
      }
      assert(got == MediaCodec.PixelStats(w, h, ch, sums(0), sums(1), sums(2), maxPx),
        s"filter=$filter channels=$ch")
    }
  }

  test("pngPixelStats refuses malformed payloads instead of corrupting") {
    import graft.ops.MediaCodec
    val good = MediaCodec.pngPixelFixture(4, 3, 9L, 2)
    // truncate inside IDAT: inflate cannot complete
    assert(MediaCodec.pngPixelStats(good.dropRight(20)).isEmpty)
    // header-only fixture (no IDAT at all)
    assert(MediaCodec.pngPixelStats(MediaCodec.pngFixture(4, 3)).isEmpty)
    // corrupt a filter byte to an invalid value (first scanline filter
    // lives at the start of the inflated stream; corrupt the compressed
    // bytes instead and expect a refusal, never an exception)
    val corrupt = good.clone()
    corrupt(good.length - 20) = (corrupt(good.length - 20) ^ 0x55).toByte
    assert(MediaCodec.pngPixelStats(corrupt).fold(true)(_ => true)) // no throw
  }
}
