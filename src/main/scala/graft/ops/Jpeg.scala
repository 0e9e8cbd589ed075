package graft.ops

/** Baseline JPEG (ITU T.81) LUMA decoder — the decode path image-level
  * dedup actually needs on a web crawl, where JPEG is the dominant
  * format (the PNG pixel path alone covers a minority; see
  * VERDICT round-13 "Decide JPEG"). Everything here is implemented from
  * the public standard: marker/segment walk (B.2), canonical Huffman
  * table construction and the DECODE procedure (C.2, F.2.2.3), entropy
  * decoding with 0xFF00 byte unstuffing and RSTn restart handling
  * (F.1.2.3), dequantization, and the classic "islow" 13-bit fixed-point
  * Loeffler/AAN-derived integer IDCT (the algorithm of the IJG
  * reference decoder, reimplemented from its published description —
  * the same arithmetic the JDK's ImageIO JPEG reader executes, which is
  * what the spec compares against).
  *
  * LUMA-ONLY by design: the Y component's blocks IDCT into the output
  * plane; chroma blocks are entropy-decoded (the bitstream cannot be
  * advanced otherwise) but skip dequant+IDCT — for 4:2:0 crawl images
  * that is 2/6 of the MCU's IDCT work for free, and perceptual hashing
  * (dHash) and pixel stats only ever consume luma. Y is full-resolution
  * whenever its sampling factors equal the maxima (4:4:4, 4:2:2, 4:2:0
  * all qualify), so no upsampling exists on this path at all.
  *
  * Profile: baseline sequential DCT (SOF0; SOF1 with 8-bit precision
  * also decodes — extended-sequential uses the same scan structure) AND
  * progressive DCT (SOF2, T.81 Annex G.1.2: spectral selection +
  * successive approximation, DC first/refine, AC first/refine with
  * EOB-run tracking). 8-bit samples, grayscale or YCbCr, optional
  * restart intervals. On the progressive path the LUMA component's
  * coefficients accrete across scans into one buffer; scans that do not
  * include luma (chroma AC and chroma-only DC scans) are SKIPPED
  * without entropy decoding — their data is self-delimiting — so the
  * luma-only contract costs even less than on the baseline path.
  * Arithmetic coding, 12-bit and hierarchical streams return None —
  * gracefully, never an error. A 256 MB output cap guards crafted
  * headers (the pngDecodePixels rule); progressive halves it (2²⁵
  * pixels) because the coefficient buffer and the plane are both live.
  *
  * Scale shape: one self-contained per-row decode (no allocation shared
  * across rows, no global state), invoked from codegen'd expressions —
  * zero shuffle, embarrassingly parallel across executors.
  */
object Jpeg {

  private final val ZigZag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  /** Canonical Huffman table in the standard's DECODE-procedure form:
    * per code length 1..16 the smallest/largest code and the index of
    * its first symbol (F.2.2.3's MINCODE/MAXCODE/VALPTR).
    */
  private final class Huff(counts: Array[Int], val symbols: Array[Int]) {
    val minCode = new Array[Int](17)
    val maxCode = new Array[Int](17)
    val valPtr = new Array[Int](17)
    locally {
      var code = 0
      var k = 0
      var l = 1
      while (l <= 16) {
        valPtr(l) = k
        minCode(l) = code
        code += counts(l - 1)
        k += counts(l - 1)
        maxCode(l) = if (counts(l - 1) > 0) code - 1 else -1
        code <<= 1
        l += 1
      }
    }
  }

  private final class Comp(val id: Int, val h: Int, val v: Int, val tq: Int) {
    var td = 0
    var ta = 0
    var pred = 0
  }

  /** MSB-first bit reader over the entropy-coded segment with 0xFF00
    * unstuffing; a marker byte (0xFF followed by non-zero) ends the
    * readable stream — restarts are consumed explicitly by the caller.
    */
  private final class BitReader(b: Array[Byte], var p: Int) {
    private var acc = 0L
    private var n = 0

    def fill(): Boolean = {
      while (n <= 56) {
        if (p >= b.length) return n > 0
        val x = b(p) & 0xff
        if (x == 0xff) {
          if (p + 1 >= b.length) return n > 0
          val m = b(p + 1) & 0xff
          if (m == 0) { acc = (acc << 8) | 0xff; n += 8; p += 2 }
          else return n > 0 // marker: stop feeding, caller handles
        } else { acc = (acc << 8) | x; n += 8; p += 1 }
      }
      true
    }

    /** Next single bit, or -1 on a truncated stream. */
    def bit(): Int = {
      if (n == 0 && !fill()) return -1
      if (n == 0) return -1
      n -= 1
      ((acc >>> n) & 1L).toInt
    }

    /** `len` bits MSB-first (len ≤ 16), or -1 on truncation. */
    def bits(len: Int): Int = {
      if (len == 0) return 0
      var v = 0
      var i = 0
      while (i < len) {
        val x = bit()
        if (x < 0) return -1
        v = (v << 1) | x
        i += 1
      }
      v
    }

    /** Drop any partial byte and consume an expected RSTn marker. */
    def restart(): Boolean = {
      acc = 0L; n = 0
      // the marker sits at p (possibly after fill bytes)
      while (p + 1 < b.length && (b(p) & 0xff) == 0xff && (b(p + 1) & 0xff) == 0xff) p += 1
      if (p + 1 >= b.length || (b(p) & 0xff) != 0xff) return false
      val m = b(p + 1) & 0xff
      if (m < 0xd0 || m > 0xd7) return false
      p += 2
      true
    }
  }

  /** F.2.2.3 DECODE: one Huffman symbol, or -1 on truncation/garbage. */
  private def decodeSym(r: BitReader, t: Huff): Int = {
    var code = r.bit()
    if (code < 0) return -1
    var l = 1
    while (l <= 16) {
      if (t.maxCode(l) >= 0 && code <= t.maxCode(l))
        return t.symbols(t.valPtr(l) + code - t.minCode(l))
      val nb = r.bit()
      if (nb < 0) return -1
      code = (code << 1) | nb
      l += 1
    }
    -1
  }

  /** F.2.4.3.1 EXTEND: sign-extend a magnitude-category value. */
  @inline private def extend(v: Int, t: Int): Int =
    if (t == 0) 0 else if (v < (1 << (t - 1))) v - (1 << t) + 1 else v

  // 13-bit fixed-point constants of the islow IDCT (FIX(x) = round(x·2^13))
  private final val C_0_298631336 = 2446
  private final val C_0_390180644 = 3196
  private final val C_0_541196100 = 4433
  private final val C_0_765366865 = 6270
  private final val C_0_899976223 = 7373
  private final val C_1_175875602 = 9633
  private final val C_1_501321110 = 12299
  private final val C_1_847759065 = 15137
  private final val C_1_961570560 = 16069
  private final val C_2_053119869 = 16819
  private final val C_2_562915447 = 20995
  private final val C_3_072711026 = 25172
  private final val ConstBits = 13
  private final val Pass1Bits = 2

  @inline private def descale(x: Long, n: Int): Int = ((x + (1L << (n - 1))) >> n).toInt

  /** In-place 8×8 islow IDCT over dequantized coefficients; output is
    * level-shifted (+128) clamped samples 0..255.
    */
  private def idct8x8(in: Array[Int], out: Array[Int]): Unit = {
    val ws = new Array[Int](64)
    // pass 1: columns
    var c = 0
    while (c < 8) {
      if (in(8 + c) == 0 && in(16 + c) == 0 && in(24 + c) == 0 && in(32 + c) == 0 &&
        in(40 + c) == 0 && in(48 + c) == 0 && in(56 + c) == 0) {
        val dc = in(c) << Pass1Bits
        var i = 0
        while (i < 8) { ws(i * 8 + c) = dc; i += 1 }
      } else {
        var z2 = in(16 + c).toLong; var z3 = in(48 + c).toLong
        var z1 = (z2 + z3) * C_0_541196100
        val t2 = z1 + z3 * (-C_1_847759065)
        val t3 = z1 + z2 * C_0_765366865
        z2 = in(c).toLong; z3 = in(32 + c).toLong
        val t0 = (z2 + z3) << ConstBits
        val t1 = (z2 - z3) << ConstBits
        val t10 = t0 + t3; val t13 = t0 - t3; val t11 = t1 + t2; val t12 = t1 - t2
        var o0 = in(56 + c).toLong; var o1 = in(40 + c).toLong
        var o2 = in(24 + c).toLong; var o3 = in(8 + c).toLong
        z1 = o0 + o3; z2 = o1 + o2; z3 = o0 + o2; var z4 = o1 + o3
        val z5 = (z3 + z4) * C_1_175875602
        o0 *= C_0_298631336; o1 *= C_2_053119869; o2 *= C_3_072711026; o3 *= C_1_501321110
        z1 *= -C_0_899976223; z2 *= -C_2_562915447; z3 *= -C_1_961570560; z4 *= -C_0_390180644
        z3 += z5; z4 += z5
        o0 += z1 + z3; o1 += z2 + z4; o2 += z2 + z3; o3 += z1 + z4
        ws(c) = descale(t10 + o3, ConstBits - Pass1Bits)
        ws(56 + c) = descale(t10 - o3, ConstBits - Pass1Bits)
        ws(8 + c) = descale(t11 + o2, ConstBits - Pass1Bits)
        ws(48 + c) = descale(t11 - o2, ConstBits - Pass1Bits)
        ws(16 + c) = descale(t12 + o1, ConstBits - Pass1Bits)
        ws(40 + c) = descale(t12 - o1, ConstBits - Pass1Bits)
        ws(24 + c) = descale(t13 + o0, ConstBits - Pass1Bits)
        ws(32 + c) = descale(t13 - o0, ConstBits - Pass1Bits)
      }
      c += 1
    }
    // pass 2: rows, final descale + level shift + clamp
    var r = 0
    while (r < 8) {
      val b = r * 8
      var z2 = ws(b + 2).toLong; var z3 = ws(b + 6).toLong
      var z1 = (z2 + z3) * C_0_541196100
      val t2 = z1 + z3 * (-C_1_847759065)
      val t3 = z1 + z2 * C_0_765366865
      z2 = ws(b).toLong; z3 = ws(b + 4).toLong
      val t0 = (z2 + z3) << ConstBits
      val t1 = (z2 - z3) << ConstBits
      val t10 = t0 + t3; val t13 = t0 - t3; val t11 = t1 + t2; val t12 = t1 - t2
      var o0 = ws(b + 7).toLong; var o1 = ws(b + 5).toLong
      var o2 = ws(b + 3).toLong; var o3 = ws(b + 1).toLong
      z1 = o0 + o3; z2 = o1 + o2; z3 = o0 + o2; var z4 = o1 + o3
      val z5 = (z3 + z4) * C_1_175875602
      o0 *= C_0_298631336; o1 *= C_2_053119869; o2 *= C_3_072711026; o3 *= C_1_501321110
      z1 *= -C_0_899976223; z2 *= -C_2_562915447; z3 *= -C_1_961570560; z4 *= -C_0_390180644
      z3 += z5; z4 += z5
      o0 += z1 + z3; o1 += z2 + z4; o2 += z2 + z3; o3 += z1 + z4
      val sh = ConstBits + Pass1Bits + 3
      @inline def px(x: Long): Int = {
        val v = descale(x, sh) + 128
        if (v < 0) 0 else if (v > 255) 255 else v
      }
      out(b) = px(t10 + o3); out(b + 7) = px(t10 - o3)
      out(b + 1) = px(t11 + o2); out(b + 6) = px(t11 - o2)
      out(b + 2) = px(t12 + o1); out(b + 5) = px(t12 - o1)
      out(b + 3) = px(t13 + o0); out(b + 4) = px(t13 - o0)
      r += 1
    }
  }

  /** Decode the LUMA plane of a baseline JPEG: (width, height, row-major
    * Y samples 0..255). None for anything outside the baseline profile,
    * truncated streams, entropy garbage, or headers whose plane would
    * exceed the 256 MB cap — graceful, never an exception.
    */
  def decodeLuma(b: Array[Byte]): Option[(Int, Int, Array[Int])] = {
    if (b.length < 4 || (b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8) return None
    val qt = Array.ofDim[Int](4, 64) // natural order
    val qtSeen = new Array[Boolean](4)
    val dcTabs = new Array[Huff](4)
    val acTabs = new Array[Huff](4)
    var comps: Array[Comp] = null
    var w = 0; var h = 0
    var restartInterval = 0
    var p = 2
    var sosAt = -1

    // ---- progressive (SOF2) state: luma coefficients accrete across
    // scans in block-contiguous natural order; pbW×pbH is the luma block
    // grid at the interleaved (MCU-padded) extent, which contains every
    // non-interleaved scan's own raster ----
    var progressive = false
    var progDone = false
    var progScanSeen = false
    var progCoefs: Array[Int] = null
    var pbW = 0; var pbH = 0
    var eobrun = 0

    /** Advance past self-delimiting entropy data (stuffed 0xFF00 bytes
      * and RSTn markers included) to the next true marker.
      */
    def skipEntropy(from: Int): Int = {
      var q = from
      while (q < b.length) {
        if ((b(q) & 0xff) == 0xff && q + 1 < b.length) {
          val m2 = b(q + 1) & 0xff
          if (m2 == 0 || (m2 >= 0xd0 && m2 <= 0xd7)) q += 2 else return q
        } else q += 1
      }
      b.length
    }

    /** One progressive scan (T.81 G.1.2): returns the next marker
      * position, or -1 on malformed data. Scans without the luma
      * component skip without entropy decoding.
      */
    def progScan(scanComps: Array[Comp], ss: Int, se: Int, ah: Int, al: Int,
                 start: Int): Int = {
      val hmaxI = comps.map(_.h).max; val vmaxI = comps.map(_.v).max
      val mX = (w + 8 * hmaxI - 1) / (8 * hmaxI)
      val mY = (h + 8 * vmaxI - 1) / (8 * vmaxI)
      if (progCoefs == null) {
        val yc = comps(0)
        if (yc.h != hmaxI || yc.v != vmaxI) return -1 // Y must be full-res
        if (w.toLong * h > (1L << 25)) return -1      // progressive cap
        pbW = mX * yc.h; pbH = mY * yc.v
        progCoefs = new Array[Int](pbW * pbH * 64)
      }
      if (ss > se || se > 63 || al > 13 || ah > 13) return -1
      if (ss == 0 && se != 0) return -1              // DC scans: band {0}
      if (ss > 0 && scanComps.length != 1) return -1 // AC scans: one comp
      if (!scanComps.exists(_ eq comps(0))) return skipEntropy(start)
      val r = new BitReader(b, start)
      eobrun = 0
      scanComps.foreach(_.pred = 0)
      var units = 0 // restart cadence: MCUs (interleaved) / blocks (single)

      def checkRestart(): Boolean = {
        if (restartInterval > 0 && units > 0 && units % restartInterval == 0) {
          if (!r.restart()) return false
          scanComps.foreach(_.pred = 0)
          eobrun = 0
        }
        true
      }

      // DC first pass (diff at precision al) / refinement (one bit)
      def dcBlock(c: Comp, blockIdx: Int): Boolean = {
        val store = (c eq comps(0)) && blockIdx >= 0
        if (ah == 0) {
          val t = dcTabs(c.td)
          if (t == null) return false
          val s = decodeSym(r, t)
          if (s < 0 || s > 15) return false
          val diffBits = r.bits(s)
          if (diffBits < 0) return false
          c.pred += extend(diffBits, s)
          if (store) progCoefs(blockIdx * 64) = c.pred << al
        } else {
          val bit = r.bit()
          if (bit < 0) return false
          if (store && bit == 1) progCoefs(blockIdx * 64) |= 1 << al
        }
        true
      }

      // AC first pass over band [ss, se] with EOB-run carry across blocks
      def acFirstBlock(off: Int): Boolean = {
        if (eobrun > 0) { eobrun -= 1; return true }
        val t = acTabs(scanComps(0).ta)
        if (t == null) return false
        var k = ss
        while (k <= se) {
          val rs = decodeSym(r, t)
          if (rs < 0) return false
          val r4 = rs >> 4; val s4 = rs & 0x0f
          if (s4 == 0) {
            if (r4 == 15) k += 16 // ZRL
            else {
              eobrun = (1 << r4) - 1
              if (r4 > 0) {
                val x = r.bits(r4)
                if (x < 0) return false
                eobrun += x
              }
              return true
            }
          } else {
            k += r4
            if (k > se) return false
            val vb = r.bits(s4)
            if (vb < 0) return false
            progCoefs(off + ZigZag(k)) = extend(vb, s4) << al
            k += 1
          }
        }
        true
      }

      // AC refinement (G.1.2.3): new ±1·2^al coefficients interleaved
      // with correction bits for already-nonzero ones; EOB runs append
      // correction bits only
      def acRefineBlock(off: Int): Boolean = {
        val p1 = 1 << al; val m1 = -1 << al
        var k = ss
        if (eobrun == 0) {
          val t = acTabs(scanComps(0).ta)
          if (t == null) return false
          var breakEob = false
          while (!breakEob && k <= se) {
            val rs = decodeSym(r, t)
            if (rs < 0) return false
            var r4 = rs >> 4; val s4 = rs & 0x0f
            var newVal = 0
            if (s4 == 0) {
              if (r4 != 15) {
                eobrun = 1 << r4
                if (r4 > 0) {
                  val x = r.bits(r4)
                  if (x < 0) return false
                  eobrun += x
                }
                breakEob = true
              }
            } else {
              if (s4 != 1) return false // refinement magnitudes are ±1
              val sb = r.bit()
              if (sb < 0) return false
              newVal = if (sb == 1) p1 else m1
            }
            if (!breakEob) {
              // advance over r4 zero-history positions, appending
              // correction bits to nonzero ones; place the new value at
              // the (r4+1)-th zero slot
              var placed = false
              while (!placed && k <= se) {
                val z = off + ZigZag(k)
                if (progCoefs(z) != 0) {
                  val cb = r.bit()
                  if (cb < 0) return false
                  if (cb == 1 && (progCoefs(z) & p1) == 0)
                    progCoefs(z) += (if (progCoefs(z) >= 0) p1 else m1)
                  k += 1
                } else if (r4 == 0) {
                  if (newVal != 0) progCoefs(z) = newVal
                  k += 1
                  placed = true
                } else { r4 -= 1; k += 1 }
              }
              // a corrupt stream can run out of zero-history slots before
              // the new coefficient places; dropping it silently would
              // leave the entropy walk bit-desynced — fail like every
              // other malformed-data path (→ None)
              if (!placed && newVal != 0) return false
            }
          }
        }
        if (eobrun > 0) {
          while (k <= se) {
            val z = off + ZigZag(k)
            if (progCoefs(z) != 0) {
              val cb = r.bit()
              if (cb < 0) return false
              if (cb == 1 && (progCoefs(z) & p1) == 0)
                progCoefs(z) += (if (progCoefs(z) >= 0) p1 else m1)
            }
            k += 1
          }
          eobrun -= 1
        }
        true
      }

      if (scanComps.length > 1) { // interleaved: DC scans only
        var mcu = 0
        val nM = mX * mY
        while (mcu < nM) {
          if (!checkRestart()) return -1
          units += 1
          val mx = mcu % mX; val my = mcu / mX
          var ci = 0
          while (ci < scanComps.length) {
            val c = scanComps(ci)
            val isY = c eq comps(0)
            var bv = 0
            while (bv < c.v) {
              var bh2 = 0
              while (bh2 < c.h) {
                val bIdx = if (isY) (my * c.v + bv) * pbW + (mx * c.h + bh2)
                           else -1
                if (!dcBlock(c, bIdx)) return -1
                bh2 += 1
              }
              bv += 1
            }
            ci += 1
          }
          mcu += 1
        }
      } else { // non-interleaved: the component's own block raster
        val c = scanComps(0) // luma (chroma-only scans skipped above)
        val cw = (w * c.h + hmaxI - 1) / hmaxI
        val ch = (h * c.v + vmaxI - 1) / vmaxI
        val nBW = (cw + 7) / 8; val nBH = (ch + 7) / 8
        var n = 0
        val nB = nBW * nBH
        while (n < nB) {
          if (!checkRestart()) return -1
          units += 1
          val bIdx = (n / nBW) * pbW + (n % nBW)
          if (ss == 0) { if (!dcBlock(c, bIdx)) return -1 }
          else if (ah == 0) { if (!acFirstBlock(bIdx * 64)) return -1 }
          else { if (!acRefineBlock(bIdx * 64)) return -1 }
          n += 1
        }
      }
      progScanSeen = true
      skipEntropy(r.p)
    }

    while (sosAt < 0 && !progDone && p + 3 < b.length) {
      if ((b(p) & 0xff) != 0xff) return None
      while (p + 3 < b.length && (b(p + 1) & 0xff) == 0xff) p += 1 // fill bytes
      if (p + 3 >= b.length) return None
      val m = b(p + 1) & 0xff
      if (m == 0xd8 || (m >= 0xd0 && m <= 0xd7) || m == 0x01) { p += 2 }
      else if (m == 0xd9) { // EOI: ends a progressive stream, else premature
        if (progressive && progScanSeen) progDone = true
        else return None
      }
      else {
        val len = ((b(p + 2) & 0xff) << 8) | (b(p + 3) & 0xff)
        if (len < 2 || p + 2 + len > b.length) return None
        val d = p + 4 // segment data
        val dEnd = p + 2 + len
        m match {
          case 0xdb => // DQT: one or more tables
            var q = d
            while (q < dEnd) {
              val pq = (b(q) & 0xff) >> 4; val tq = b(q) & 0x0f
              if (tq > 3 || pq > 1) return None
              if (q + 1 + 64 * (pq + 1) > dEnd) return None
              var k = 0
              while (k < 64) {
                val v = if (pq == 0) b(q + 1 + k) & 0xff
                else (((b(q + 1 + 2 * k) & 0xff) << 8) | (b(q + 2 + 2 * k) & 0xff))
                qt(tq)(ZigZag(k)) = v
                k += 1
              }
              qtSeen(tq) = true
              q += 1 + 64 * (pq + 1)
            }
          case 0xc4 => // DHT: one or more tables
            var q = d
            while (q < dEnd) {
              val tc = (b(q) & 0xff) >> 4; val th = b(q) & 0x0f
              if (tc > 1 || th > 3 || q + 17 > dEnd) return None
              val counts = new Array[Int](16)
              var total = 0
              var i = 0
              while (i < 16) { counts(i) = b(q + 1 + i) & 0xff; total += counts(i); i += 1 }
              if (total > 256 || q + 17 + total > dEnd) return None
              val syms = new Array[Int](total)
              i = 0
              while (i < total) { syms(i) = b(q + 17 + i) & 0xff; i += 1 }
              val t = new Huff(counts, syms)
              if (tc == 0) dcTabs(th) = t else acTabs(th) = t
              q += 17 + total
            }
          case 0xc0 | 0xc1 | 0xc2 => // SOF0/SOF1 sequential, SOF2 progressive
            if (comps != null) return None
            if (m == 0xc2) progressive = true
            val prec = b(d) & 0xff
            if (prec != 8) return None
            h = ((b(d + 1) & 0xff) << 8) | (b(d + 2) & 0xff)
            w = ((b(d + 3) & 0xff) << 8) | (b(d + 4) & 0xff)
            val nc = b(d + 5) & 0xff
            // grayscale or YCbCr only: a 4-component frame is Adobe
            // CMYK/YCCK (often APP14-inverted), where component 0 is the
            // CYAN channel, not luma — decoding it would feed semantically
            // wrong values into the shared PNG/JPEG perceptual-hash space,
            // so those streams return None instead of a wrong answer
            if (w <= 0 || h <= 0 || (nc != 1 && nc != 3) || d + 6 + 3 * nc > dEnd) return None
            // 256 MB luma cap in BYTES (the pngDecodePixels rule): the
            // plane is Array[Int], 4 bytes/pixel, so cap pixels at 2^26
            if (w.toLong * h > (1L << 26)) return None
            comps = Array.tabulate(nc) { i =>
              val o = d + 6 + 3 * i
              new Comp(b(o) & 0xff, (b(o + 1) & 0xff) >> 4, b(o + 1) & 0x0f, b(o + 2) & 0x0f)
            }
            if (comps.exists(c => c.h < 1 || c.h > 4 || c.v < 1 || c.v > 4 || c.tq > 3))
              return None
            // T.81 A.2.3: a NON-INTERLEAVED scan (one component per scan,
            // which for a single-component frame is the only form) uses
            // one data unit per MCU in plain raster order — the declared
            // sampling factors are inter-component ratios and do not
            // change the single component's own block layout. Normalize
            // so the MCU walk below is the raster walk.
            if (nc == 1 && (comps(0).h != 1 || comps(0).v != 1))
              comps = Array(new Comp(comps(0).id, 1, 1, comps(0).tq))
          case 0xc3 | 0xc5 | 0xc6 | 0xc7 | 0xc9 | 0xca | 0xcb | 0xcd | 0xce | 0xcf =>
            return None // lossless/arithmetic/hierarchical: out of profile
          case 0xdd => // DRI
            if (len != 4) return None
            restartInterval = ((b(d) & 0xff) << 8) | (b(d + 1) & 0xff)
          case 0xda => // SOS
            if (comps == null) return None
            val ns = b(d) & 0xff
            if (ns < 1 || d + 1 + 2 * ns + 3 > dEnd) return None
            if (!progressive && ns != comps.length) return None
            val scanComps = new Array[Comp](ns)
            var i = 0
            while (i < ns) {
              val cs = b(d + 1 + 2 * i) & 0xff
              val tt = b(d + 2 + 2 * i) & 0xff
              val comp = comps.find(_.id == cs).getOrElse(return None)
              comp.td = tt >> 4; comp.ta = tt & 0x0f
              scanComps(i) = comp
              i += 1
            }
            if (!progressive) sosAt = dEnd // entropy data starts here
            else {
              val ss = b(d + 1 + 2 * ns) & 0xff
              val se = b(d + 2 + 2 * ns) & 0xff
              val ahal = b(d + 3 + 2 * ns) & 0xff
              val np = progScan(scanComps, ss, se, ahal >> 4, ahal & 0x0f, dEnd)
              if (np < 0) return None
              p = np // jump over the scan's entropy data
            }
          case _ => () // APPn, COM, others: skip
        }
        // progressive SOS advanced p itself (past the entropy data)
        if (sosAt < 0 && !(progressive && m == 0xda)) p += 2 + len
      }
    }

    // ---- progressive render: dequant + IDCT every luma block of the
    // accreted coefficient buffer (a truncated stream — markers ran out
    // before EOI — renders whatever scans arrived, the standard
    // progressive-viewer behavior) ----
    if (progressive) {
      if (!progScanSeen) return None
      val yc = comps(0)
      if (!qtSeen(yc.tq)) return None
      val planeW = pbW * 8
      val luma = new Array[Int](pbW * pbH * 64)
      val yQt = qt(yc.tq)
      val coefs = new Array[Int](64)
      val block = new Array[Int](64)
      var bi = 0
      val nB = pbW * pbH
      while (bi < nB) {
        var i = 0
        while (i < 64) { coefs(i) = progCoefs(bi * 64 + i) * yQt(i); i += 1 }
        idct8x8(coefs, block)
        val x0 = (bi % pbW) * 8; val y0 = (bi / pbW) * 8
        var by = 0
        while (by < 8) {
          val rowOff = (y0 + by) * planeW + x0
          var bx = 0
          while (bx < 8) { luma(rowOff + bx) = block(by * 8 + bx); bx += 1 }
          by += 1
        }
        bi += 1
      }
      return (if (planeW == w && pbH * 8 == h) Some((w, h, luma))
      else {
        val out = new Array[Int](w * h)
        var yy = 0
        while (yy < h) {
          System.arraycopy(luma, yy * planeW, out, yy * w, w)
          yy += 1
        }
        Some((w, h, out))
      })
    }
    if (sosAt < 0) return None

    val hmax = comps.map(_.h).max
    val vmax = comps.map(_.v).max
    val y = comps(0) // luma = first component by convention
    if (y.h != hmax || y.v != vmax) return None // Y must be full-resolution
    if (!qtSeen(y.tq)) return None
    val mcusX = (w + 8 * hmax - 1) / (8 * hmax)
    val mcusY = (h + 8 * vmax - 1) / (8 * vmax)
    val planeW = mcusX * 8 * hmax
    val luma = new Array[Int](planeW * mcusY * 8 * vmax)

    val r = new BitReader(b, sosAt)
    val coefs = new Array[Int](64)
    val block = new Array[Int](64)
    val yQt = qt(y.tq)
    var mcu = 0
    val nMcus = mcusX * mcusY
    while (mcu < nMcus) {
      if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
        if (!r.restart()) return None
        comps.foreach(_.pred = 0)
      }
      val mx = mcu % mcusX
      val my = mcu / mcusX
      var ci = 0
      while (ci < comps.length) {
        val comp = comps(ci)
        val dcT = dcTabs(comp.td); val acT = acTabs(comp.ta)
        if (dcT == null || acT == null) return None
        val isY = ci == 0
        var bv = 0
        while (bv < comp.v) {
          var bh = 0
          while (bh < comp.h) {
            // --- decode one block's coefficients ---
            java.util.Arrays.fill(coefs, 0)
            val s = decodeSym(r, dcT)
            if (s < 0 || s > 15) return None
            val diffBits = r.bits(s)
            if (diffBits < 0) return None
            comp.pred += extend(diffBits, s)
            coefs(0) = comp.pred
            var k = 1
            var eob = false
            while (!eob && k < 64) {
              val rs = decodeSym(r, acT)
              if (rs < 0) return None
              val rrrr = rs >> 4; val ssss = rs & 0x0f
              if (ssss == 0) {
                if (rrrr == 15) k += 16 // ZRL
                else eob = true
              } else {
                k += rrrr
                if (k > 63) return None
                val vb = r.bits(ssss)
                if (vb < 0) return None
                coefs(ZigZag(k)) = extend(vb, ssss)
                k += 1
              }
            }
            // --- luma blocks only: dequant + IDCT into the plane ---
            if (isY) {
              var i = 0
              while (i < 64) { coefs(i) *= yQt(i); i += 1 }
              idct8x8(coefs, block)
              val x0 = (mx * comp.h + bh) * 8
              val y0 = (my * comp.v + bv) * 8
              var by = 0
              while (by < 8) {
                var bx = 0
                val rowOff = (y0 + by) * planeW + x0
                while (bx < 8) { luma(rowOff + bx) = block(by * 8 + bx); bx += 1 }
                by += 1
              }
            }
            bh += 1
          }
          bv += 1
        }
        ci += 1
      }
      mcu += 1
    }

    // crop the MCU-padded plane to the declared image size
    if (planeW == w && mcusY * 8 * vmax == h) Some((w, h, luma))
    else {
      val out = new Array[Int](w * h)
      var yy = 0
      while (yy < h) {
        System.arraycopy(luma, yy * planeW, out, yy * w, w)
        yy += 1
      }
      Some((w, h, out))
    }
  }

  /** Integer luma stats over the decoded plane: (width, height, sum_luma,
    * max_luma) — the pixel-stats shape of [[MediaCodec.pngPixelStats]]
    * for the dominant crawl format. Null-safe via Option.
    */
  def jpegLumaStats(b: Array[Byte]): Option[(Long, Long, Long, Long)] = {
    val (w, h, luma) = decodeLuma(b) match {
      case Some(t) => t
      case None => return None
    }
    var s = 0L; var mx = 0L
    var i = 0
    while (i < luma.length) {
      val v = luma(i).toLong
      s += v
      if (v > mx) mx = v
      i += 1
    }
    Some((w.toLong, h.toLong, s, mx))
  }

  /** Static entry point for generated code
    * ([[graft.expressions.JpegLumaStatsExpr]]): null when not decodable.
    */
  def jpegLumaStatsRow(b: Array[Byte]): org.apache.spark.sql.catalyst.InternalRow =
    jpegLumaStats(b) match {
      case Some((w, h, s, mx)) =>
        new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
          Array[Any](w, h, s, mx))
      case None => null
    }

  /** 63-bit dHash over the decoded JPEG luma — the
    * [[MediaCodec.pngDhash63]] contract (9×8 average pools, bit =
    * left<right, bit 63 dropped) over the format crawl images actually
    * use, so [[graft.ops.Dedup.hammingPairs]] dedups PNG and JPEG
    * variants of an image in ONE hash space. Same divisibility profile
    * (9 | w, 8 | h) as the PNG path.
    */
  def jpegDhash63(b: Array[Byte]): Option[Long] = {
    val (w, h, luma) = decodeLuma(b) match {
      case Some(t) => t
      case None => return None
    }
    dhashOfLuma(w, h, luma)
  }

  /** The 9×8-pool dHash over an already-decoded luma plane — shared by
    * [[jpegDhash63]] and the gate fixtures' REFERENCE side (pooling is
    * the shared contract; the decode is what the gate tests).
    */
  private[graft] def dhashOfLuma(w: Int, h: Int, luma: Array[Int]): Option[Long] = {
    if (w % 9 != 0 || h % 8 != 0) return None
    val bw = w / 9; val bh = h / 8
    val pool = new Array[Long](72)
    var py = 0
    while (py < 8) {
      var px = 0
      while (px < 9) {
        var s = 0L
        var yy = py * bh
        while (yy < (py + 1) * bh) {
          var xx = px * bw
          val row = yy * w
          while (xx < (px + 1) * bw) { s += luma(row + xx); xx += 1 }
          yy += 1
        }
        pool(py * 9 + px) = s / (bw.toLong * bh)
        px += 1
      }
      py += 1
    }
    var hash = 0L
    var y2 = 0
    while (y2 < 8) {
      var x2 = 0
      while (x2 < 8) {
        val bit = y2 * 8 + x2
        if (bit < 63 && pool(y2 * 9 + x2) < pool(y2 * 9 + x2 + 1)) hash |= 1L << bit
        x2 += 1
      }
      y2 += 1
    }
    Some(hash)
  }

  /** Static entry point for generated code: null when not decodable. */
  def jpegDhashBoxed(b: Array[Byte]): java.lang.Long =
    jpegDhash63(b) match {
      case Some(v) => java.lang.Long.valueOf(v)
      case None => null
    }
}
