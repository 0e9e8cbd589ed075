package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Jpeg

/** The baseline-JPEG luma decoder vs the JDK's ImageIO codec — an
  * INDEPENDENT implementation of the same standard: per-pixel agreement
  * on grayscale (pure Huffman + dequant + IDCT, no color path), bounded
  * luma divergence on color (the reference luma is reconstructed through
  * the writer's YCbCr→RGB round-trip), graceful None on everything
  * outside the baseline profile. The jpeg_luma_decode GATE adjudicates
  * the same agreement at the stats/dhash grain through the codegen'd
  * expressions; this spec is the per-pixel microscope.
  */
class JpegSpec extends AnyFunSuite {

  private def encode(img: java.awt.image.BufferedImage,
                     progressive: Boolean = false): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    if (!progressive) javax.imageio.ImageIO.write(img, "jpg", bos)
    else {
      val w = javax.imageio.ImageIO.getImageWritersByFormatName("jpg").next()
      val p = w.getDefaultWriteParam
      p.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DEFAULT)
      val out = javax.imageio.ImageIO.createImageOutputStream(bos)
      w.setOutput(out)
      w.write(null, new javax.imageio.IIOImage(img, null, null), p)
      out.close(); w.dispose()
    }
    bos.toByteArray
  }

  private def gray(w: Int, h: Int, f: (Int, Int) => Int): java.awt.image.BufferedImage = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w)
      img.getRaster.setSample(x, y, 0, f(x, y) & 0xff)
    img
  }

  private def color(w: Int, h: Int, f: (Int, Int) => Int): java.awt.image.BufferedImage = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, f(x, y))
    img
  }

  test("grayscale: per-pixel agreement with ImageIO across patterns and paddings") {
    // dims exercise exact-MCU (64x64), padded (65x41, 72x64 is 9-MCU wide)
    val cases = Seq(
      (64, 64, (x: Int, y: Int) => x * 3 + y * 2),
      (65, 41, (x: Int, y: Int) => (x * x + y * 7) % 256),
      (72, 64, (x: Int, y: Int) => if ((x / 8 + y / 8) % 2 == 0) 40 else 210),
      (8, 8, (_: Int, _: Int) => 128),
      (17, 9, (x: Int, y: Int) => x * 15 + y * 11))
    cases.foreach { case (w, h, f) =>
      val jpg = encode(gray(w, h, f))
      val (dw, dh, mine) = Jpeg.decodeLuma(jpg).getOrElse(
        fail(s"decode failed for ${w}x$h"))
      assert(dw === w && dh === h)
      val ref = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(jpg))
      var maxDiff = 0
      for (y <- 0 until h; x <- 0 until w) {
        val d = math.abs(mine(y * w + x) - ref.getRaster.getSample(x, y, 0))
        if (d > maxDiff) maxDiff = d
      }
      // same standard, same islow IDCT family: at most one-ulp rounding
      // spread between scalar implementations
      assert(maxDiff <= 1, s"${w}x$h maxDiff=$maxDiff")
    }
  }

  test("color 4:2:0: luma within the RGB-roundtrip tolerance; padded crop exact-size") {
    val w = 72; val h = 64 // 16 does not divide 72 -> MCU padding + crop
    val jpg = encode(color(w, h, (x, y) =>
      (((x * 4) % 256) << 16) | (((y * 4) % 256) << 8) | ((x + y) * 2 % 256)))
    val (dw, dh, mine) = Jpeg.decodeLuma(jpg).getOrElse(fail("decode failed"))
    assert(dw === w && dh === h)
    val ref = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(jpg))
    var maxDiff = 0; var sumDiff = 0L
    for (y <- 0 until h; x <- 0 until w) {
      val rgb = ref.getRGB(x, y)
      val rl = (299 * ((rgb >> 16) & 0xff) + 587 * ((rgb >> 8) & 0xff)
        + 114 * (rgb & 0xff)) / 1000
      val d = math.abs(mine(y * w + x) - rl)
      if (d > maxDiff) maxDiff = d
      sumDiff += d
    }
    // our Y is the TRUE luma channel; the reference goes Y->RGB->luma,
    // and saturated colors CLAMP in RGB (YCbCr covers a wider gamut), so
    // clipped pixels legitimately deviate by several counts — the mean
    // is the faithful agreement metric, the max only bounds the clip
    assert(maxDiff <= 16, s"maxDiff=$maxDiff")
    assert(sumDiff.toDouble / (w * h) <= 1.0, s"meanDiff=${sumDiff.toDouble / (w * h)}")
  }

  test("dhash: gray dHash matches the reference-luma pooling; stats row shape") {
    val w = 72; val h = 64
    val jpg = encode(gray(w, h, (x, y) => x * 3 + y * 2))
    val mine = Jpeg.jpegDhash63(jpg).getOrElse(fail("no dhash"))
    val ref = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(jpg))
    val refLuma = Array.tabulate(w * h)(i => ref.getRaster.getSample(i % w, i / w, 0))
    val refDh = Jpeg.dhashOfLuma(w, h, refLuma).get
    assert(java.lang.Long.bitCount(mine ^ refDh) <= 2)
    // non-divisible dims refuse the hash but still decode
    val odd = encode(gray(65, 41, (x, y) => x + y))
    assert(Jpeg.jpegDhash63(odd).isEmpty)
    assert(Jpeg.decodeLuma(odd).isDefined)
  }

  test("chroma-only twins false-merge: the documented luma-only dedup grain") {
    // the decoder is LUMA-ONLY by design (chroma scans are skipped), so
    // two images that differ ONLY in hue must hash identically — the
    // false-merge this fixture asserts IS the documented boundary of
    // jpeg_dhash-based dedup, measured here instead of left as prose.
    // B's per-pixel color (v+51, v-26, v) keeps Y = v - 0.013 ≈ v
    // (0.299·51 ≈ 0.587·26) while shifting Cb/Cr far off neutral.
    val w = 72; val h = 64
    def v(x: Int, y: Int): Int = 30 + ((x * 3 + y * 5) % 170)
    val a = encode(color(w, h, (x, y) => {
      val g = v(x, y); (g << 16) | (g << 8) | g
    }))
    val b = encode(color(w, h, (x, y) => {
      val g = v(x, y); ((g + 51) << 16) | ((g - 26) << 8) | g
    }))
    val da = Jpeg.jpegDhash63(a).getOrElse(fail("no dhash for gray twin"))
    val db = Jpeg.jpegDhash63(b).getOrElse(fail("no dhash for hue twin"))
    val dist = java.lang.Long.bitCount(da ^ db)
    assert(dist <= 2, s"chroma-only twins should collide (got hamming $dist)")
    // sanity: the images really do differ in chroma (the JDK decodes
    // them to visibly different RGB), so the collision is the luma
    // boundary at work, not two identical files
    val ra = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(a))
    val rb = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(b))
    val rgbDiff = (0 until w * h).count(i =>
      ra.getRGB(i % w, i / w) != rb.getRGB(i % w, i / w))
    assert(rgbDiff > w * h / 2, s"twin fixture degenerate: only $rgbDiff px differ")
  }

  test("progressive (SOF2): per-pixel agreement with ImageIO on grayscale") {
    val cases = Seq(
      (64, 64, (x: Int, y: Int) => x * 3 + y * 2),
      (65, 41, (x: Int, y: Int) => (x * x + y * 7) % 256),
      (72, 64, (x: Int, y: Int) => if ((x / 8 + y / 8) % 2 == 0) 40 else 210),
      (17, 9, (x: Int, y: Int) => x * 15 + y * 11))
    cases.foreach { case (w, h, f) =>
      val jpg = encode(gray(w, h, f), progressive = true)
      val (dw, dh, mine) = Jpeg.decodeLuma(jpg).getOrElse(
        fail(s"progressive decode failed for ${w}x$h"))
      assert(dw === w && dh === h)
      val ref = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(jpg))
      var maxDiff = 0
      for (y <- 0 until h; x <- 0 until w) {
        val d = math.abs(mine(y * w + x) - ref.getRaster.getSample(x, y, 0))
        if (d > maxDiff) maxDiff = d
      }
      // the multi-scan coefficient accretion must land on the SAME
      // dequant+IDCT input as a sequential decode of the final image
      assert(maxDiff <= 1, s"progressive ${w}x$h maxDiff=$maxDiff")
    }
  }

  test("progressive color 4:2:0: luma within the RGB-roundtrip tolerance; chroma scans skipped") {
    val w = 72; val h = 64
    val jpg = encode(color(w, h, (x, y) =>
      (((x * 4) % 256) << 16) | (((y * 4) % 256) << 8) | ((x + y) * 2 % 256)),
      progressive = true)
    val (dw, dh, mine) = Jpeg.decodeLuma(jpg).getOrElse(
      fail("progressive color decode failed"))
    assert(dw === w && dh === h)
    val ref = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(jpg))
    var maxDiff = 0; var sumDiff = 0L
    for (y <- 0 until h; x <- 0 until w) {
      val rgb = ref.getRGB(x, y)
      val rl = (299 * ((rgb >> 16) & 0xff) + 587 * ((rgb >> 8) & 0xff)
        + 114 * (rgb & 0xff)) / 1000
      val d = math.abs(mine(y * w + x) - rl)
      if (d > maxDiff) maxDiff = d
      sumDiff += d
    }
    assert(maxDiff <= 16, s"maxDiff=$maxDiff")
    assert(sumDiff.toDouble / (w * h) <= 1.0,
      s"meanDiff=${sumDiff.toDouble / (w * h)}")
    // the dHash spaces agree across the coding modes: a progressive and
    // a baseline encode of the same image land within dedup distance
    val base = encode(color(w, h, (x, y) =>
      (((x * 4) % 256) << 16) | (((y * 4) % 256) << 8) | ((x + y) * 2 % 256)))
    val d1 = Jpeg.jpegDhash63(jpg).getOrElse(fail("no progressive dhash"))
    val d2 = Jpeg.jpegDhash63(base).getOrElse(fail("no baseline dhash"))
    assert(java.lang.Long.bitCount(d1 ^ d2) <= 4)
  }

  test("out-of-profile and garbage are graceful None, never an exception") {
    val img = gray(32, 32, (x, y) => x * y)
    // truncated progressive stream: graceful (partial render or None)
    val prog = encode(img, progressive = true)
    Jpeg.decodeLuma(prog.take(prog.length / 2)) // must not throw
    Jpeg.decodeLuma(prog.take(prog.length * 3 / 4))
    // truncated baseline stream
    val full = encode(img)
    assert(Jpeg.decodeLuma(full.take(full.length / 2)).isEmpty)
    // not a JPEG at all / empty
    assert(Jpeg.decodeLuma("not a jpeg".getBytes).isEmpty)
    assert(Jpeg.decodeLuma(Array.emptyByteArray).isEmpty)
    // PNG magic
    assert(Jpeg.decodeLuma(graft.ops.MediaCodec.pngFixture(8, 8)).isEmpty)
  }
}
