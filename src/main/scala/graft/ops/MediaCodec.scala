package graft.ops

/** Container-header codecs for multimodal binary columns: real parsers for
  * the public PNG / JPEG / GIF / WAV container formats (magic detection +
  * dimension/frame extraction from the headers — no pixel/sample decode,
  * which is all the metadata stage needs).
  *
  * Field conventions in [[MediaMeta]]:
  *  - images (png/jpeg/gif): width/height in pixels, n_frames = 1
  *  - wav audio: width = sample rate (Hz), height = channel count,
  *    n_frames = sample frames (data bytes / block align)
  */
object MediaCodec {

  final case class MediaMeta(media_type: String, width: Int, height: Int,
                             n_frames: Int, byte_len: Long)

  @inline private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  @inline private def be16(b: Array[Byte], i: Int): Int = (u8(b, i) << 8) | u8(b, i + 1)
  @inline private def be32(b: Array[Byte], i: Int): Int =
    (u8(b, i) << 24) | (u8(b, i + 1) << 16) | (u8(b, i + 2) << 8) | u8(b, i + 3)
  @inline private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
  @inline private def le32(b: Array[Byte], i: Int): Int =
    u8(b, i) | (u8(b, i + 1) << 8) | (u8(b, i + 2) << 16) | (u8(b, i + 3) << 24)
  private def ascii4(b: Array[Byte], i: Int): String =
    new String(b, i, 4, java.nio.charset.StandardCharsets.US_ASCII)

  /** PNG: 8-byte signature, then the IHDR chunk holds width/height as
    * big-endian int32 at byte offsets 16 and 20.
    */
  def probePng(b: Array[Byte]): Option[MediaMeta] = {
    val sig = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)
    if (b.length < 24 || !b.take(8).sameElements(sig)) return None
    if (ascii4(b, 12) != "IHDR") return None
    Some(MediaMeta("png", be32(b, 16), be32(b, 20), 1, b.length.toLong))
  }

  /** JPEG: SOI marker then a sequence of FF-marker segments; the first SOF
    * (start-of-frame, 0xC0-0xCF except C4/C8/CC) segment carries height
    * (BE16 at data offset +3) and width (+5). Non-SOF segments are skipped
    * via their BE16 length field. Encoders may pad between segments with
    * runs of 0xFF fill bytes (ITU T.81 §B.1.1.2: any marker may be
    * preceded by fill) — the walk skips them rather than misreading the
    * fill byte as a marker with a bogus length.
    */
  def probeJpeg(b: Array[Byte]): Option[MediaMeta] = {
    if (b.length < 4 || u8(b, 0) != 0xff || u8(b, 1) != 0xd8) return None
    var p = 2
    while (p + 3 < b.length) {
      if (u8(b, p) != 0xff) return None
      while (p + 3 < b.length && u8(b, p + 1) == 0xff) p += 1 // fill bytes
      // a truncated stream ending inside a fill run leaves p near the end;
      // re-check before the length-field reads below touch p+2/p+3
      if (p + 3 >= b.length) return None
      val m = u8(b, p + 1)
      if (m == 0xd8 || (m >= 0xd0 && m <= 0xd7) || m == 0x01) p += 2 // standalone markers
      else if (m == 0xd9) return None // EOI before any SOF
      else {
        val len = be16(b, p + 2)
        if (len < 2) return None
        val isSof = m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc
        if (isSof) {
          if (p + 8 >= b.length) return None
          return Some(MediaMeta("jpeg", be16(b, p + 7), be16(b, p + 5), 1, b.length.toLong))
        }
        p += 2 + len
      }
    }
    None
  }

  /** GIF87a/GIF89a: logical screen width/height as LE16 at offsets 6/8. */
  def probeGif(b: Array[Byte]): Option[MediaMeta] = {
    if (b.length < 10) return None
    val hdr = new String(b, 0, 6, java.nio.charset.StandardCharsets.US_ASCII)
    if (hdr != "GIF87a" && hdr != "GIF89a") return None
    Some(MediaMeta("gif", le16(b, 6), le16(b, 8), 1, b.length.toLong))
  }

  /** WAV: RIFF/WAVE container; walk the chunk list for `fmt ` (channels
    * LE16 at data +2, sample rate LE32 at +4, block align LE16 at +12) and
    * `data` (size → frame count). Chunk sizes are LE32 and padded to even.
    */
  def probeWav(b: Array[Byte]): Option[MediaMeta] = {
    if (b.length < 12 || ascii4(b, 0) != "RIFF" || ascii4(b, 8) != "WAVE") return None
    var p = 12
    var sampleRate = 0; var channels = 0; var blockAlign = 0
    var dataSize = -1
    while (p + 8 <= b.length) {
      val id = ascii4(b, p)
      val size = le32(b, p + 4)
      // a corrupt/crafted size with the top bit set decodes negative and
      // would stall or reverse the chunk walk — reject the container
      if (size < 0) return None
      if (id == "fmt " && p + 8 + 14 <= b.length) {
        channels = le16(b, p + 10)
        sampleRate = le32(b, p + 12)
        blockAlign = le16(b, p + 20)
      } else if (id == "data") {
        dataSize = size
      }
      p += 8 + size + (size & 1)
    }
    if (sampleRate == 0 || dataSize < 0) return None
    val frames = if (blockAlign > 0) dataSize / blockAlign else 0
    Some(MediaMeta("wav", sampleRate, channels, frames, b.length.toLong))
  }

  /** Detect by magic bytes and parse; unknown containers fall back to the
    * declared type with zero dimensions (byte_len always real).
    */
  def probe(b: Array[Byte], declaredType: String): MediaMeta =
    probePng(b).orElse(probeJpeg(b)).orElse(probeGif(b)).orElse(probeWav(b))
      .getOrElse(MediaMeta(declaredType, 0, 0, 1, b.length.toLong))

  // ---------- fixtures (test/dev only): minimal valid containers ----------

  /** Minimal PNG: signature + IHDR chunk (CRC zeroed — not validated by
    * header parsers) + IEND. 8 + 25 + 12 = 45 bytes.
    */
  def pngFixture(w: Int, h: Int): Array[Byte] = {
    val out = java.nio.ByteBuffer.allocate(45)
    out.put(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
    out.putInt(13).put("IHDR".getBytes).putInt(w).putInt(h)
      .put(8.toByte).put(2.toByte).put(0.toByte).put(0.toByte).put(0.toByte)
      .putInt(0) // IHDR CRC (unchecked)
    out.putInt(0).put("IEND".getBytes).putInt(0)
    out.array()
  }

  /** Minimal JPEG: SOI + APP0 (so parsers must skip a segment) + two 0xFF
    * fill bytes before SOF0 (so parsers must handle inter-segment padding,
    * T.81 §B.1.1.2) + SOF0 + EOI.
    */
  def jpegFixture(w: Int, h: Int): Array[Byte] = {
    val out = java.nio.ByteBuffer.allocate(2 + 18 + 2 + 13 + 2)
    out.put(0xff.toByte).put(0xd8.toByte)                      // SOI
    out.put(0xff.toByte).put(0xe0.toByte).putShort(16.toShort) // APP0, len 16
      .put("JFIF".getBytes).put(0.toByte)
      .putShort(0x0101.toShort).put(0.toByte).putShort(1.toShort).putShort(1.toShort)
      .put(0.toByte).put(0.toByte)
    out.put(0xff.toByte).put(0xff.toByte)                      // fill bytes
    out.put(0xff.toByte).put(0xc0.toByte).putShort(11.toShort) // SOF0, len 11
      .put(8.toByte).putShort(h.toShort).putShort(w.toShort).put(1.toByte)
      .put(1.toByte).put(0x11.toByte).put(0.toByte)
    out.put(0xff.toByte).put(0xd9.toByte)                      // EOI
    out.array()
  }

  /** Minimal GIF89a: 6-byte header, LE16 logical screen width/height,
    * packed/background/aspect bytes, trailer. 14 bytes.
    */
  def gifFixture(w: Int, h: Int): Array[Byte] = {
    val out = java.nio.ByteBuffer.allocate(14).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("GIF89a".getBytes)
    out.putShort(w.toShort).putShort(h.toShort)
    out.put(0.toByte).put(0.toByte).put(0.toByte) // packed, bg index, aspect
    out.put(0x3b.toByte)                          // trailer
    out.array()
  }

  /** Minimal WAV: RIFF/WAVE + fmt + empty data chunk whose declared size
    * encodes `frames` sample frames (header-only, 44 bytes).
    */
  def wavFixture(sampleRate: Int, channels: Int, frames: Int): Array[Byte] = {
    val blockAlign = channels * 2 // 16-bit PCM
    val dataSize = frames * blockAlign
    val out = java.nio.ByteBuffer.allocate(44).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes).putInt(36 + dataSize).put("WAVE".getBytes)
    out.put("fmt ".getBytes).putInt(16)
      .putShort(1.toShort).putShort(channels.toShort).putInt(sampleRate)
      .putInt(sampleRate * blockAlign).putShort(blockAlign.toShort).putShort(16.toShort)
    out.put("data".getBytes).putInt(dataSize)
    out.array() // data chunk declared but not materialized (header fixture)
  }
}
