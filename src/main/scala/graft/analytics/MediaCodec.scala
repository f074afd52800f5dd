package graft.analytics

import java.nio.{ByteBuffer, ByteOrder}

/** Real (if minimal) media-container codecs — the pure-JVM, zero-dependency
  * slice of what a decode stage does: build and parse actual BMP and WAV
  * headers byte-for-byte per the public file-format specs. This replaces
  * the "deterministic fake" half of [[Multimodal.decodeStub]]'s contract
  * for payloads that really are media: the header PARSE is the real
  * operation (offsets, little-endian fields, chunk walking); only pixel/
  * sample DECODE beyond the header stays out of scope (no codec libs in
  * this container, and none needed for metadata extraction).
  *
  * False-positive safety: [[probe]] validates the SIZE fields against the
  * actual byte length (BMP `bfSize`, RIFF chunk size). ASCII text that
  * happens to start with "BM" or "RIFF" cannot pass — any 4 ASCII
  * printable bytes read as a little-endian int are ≥ 0x20202020 (~5.4e8),
  * orders of magnitude above any real payload length here — so feeding
  * arbitrary documents through the probe never misclassifies.
  */
object MediaCodec {

  /** Probed header metadata; exactly one family of fields is set per
    * format (bmp: raster dims; wav: sample geometry). */
  final case class MediaInfo(fmt: String,
                             width: Long = -1L, height: Long = -1L,
                             sampleRate: Long = -1L, channels: Long = -1L,
                             nSamples: Long = -1L)

  /** Pixels per BMP row in [[toBmp]]: 64 × 3 bytes = 192-byte stride,
    * already 4-byte aligned so the format's row padding is zero. */
  val BmpWidth = 64

  private def le(n: Int): Int = n // readability marker for LE fields

  /** Wrap arbitrary bytes as a real 24-bpp bottom-up BMP (BITMAPFILEHEADER
    * + BITMAPINFOHEADER + pixel rows, zero-padded tail): width defaults to
    * [[BmpWidth]], height = ceil(ceil(len/3) / width), min 1. Rows honor
    * the format's 4-byte stride alignment: payload byte `3p..3p+2` is
    * pixel `p`'s BGR triple, laid out at file offset
    * `54 + (p/width)·stride + 3·(p%width)` with zero pad bytes between
    * rows when `3·width` is not a multiple of 4 (width 64 → stride 192,
    * already aligned, so the r14 byte-layout is unchanged). */
  def toBmp(data: Array[Byte], width: Int = BmpWidth): Array[Byte] = {
    require(width > 0)
    val pixels = (data.length + 2) / 3
    val height = math.max(1, (pixels + width - 1) / width)
    val stride = ((width * 3 + 3) / 4) * 4
    val imageSize = stride * height
    val fileSize = 54 + imageSize
    val b = ByteBuffer.allocate(fileSize).order(ByteOrder.LITTLE_ENDIAN)
    b.put('B'.toByte).put('M'.toByte)
    b.putInt(le(fileSize)) // bfSize — the field probe() validates
    b.putInt(0)            // reserved
    b.putInt(le(54))       // pixel-data offset
    b.putInt(le(40))       // BITMAPINFOHEADER size
    b.putInt(le(width))
    b.putInt(le(height))
    b.putShort(1)          // planes
    b.putShort(24)         // bpp
    b.putInt(0)            // BI_RGB (uncompressed)
    b.putInt(le(imageSize))
    b.putInt(2835).putInt(2835) // 72 dpi
    b.putInt(0).putInt(0)  // palette
    if (stride == width * 3) b.put(data) // aligned: contiguous payload
    else {
      var r = 0
      while (r < height) {
        val off = r * width * 3
        val n = math.min(width * 3, math.max(0, data.length - off))
        if (n > 0) { b.position(54 + r * stride); b.put(data, off, n) }
        r += 1
      }
    }
    b.array()
  }

  /** Wrap arbitrary bytes as a real PCM WAV (RIFF/WAVE + fmt + data):
    * 16-bit mono 8 kHz; odd-length payloads get one zero pad byte so the
    * data chunk holds whole samples. */
  def toWav(data: Array[Byte]): Array[Byte] = {
    val nSamples = (data.length + 1) / 2
    val dataSize = nSamples * 2
    val b = ByteBuffer.allocate(44 + dataSize).order(ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes("US-ASCII"))
    b.putInt(le(36 + dataSize)) // RIFF chunk size — validated by probe()
    b.put("WAVE".getBytes("US-ASCII"))
    b.put("fmt ".getBytes("US-ASCII"))
    b.putInt(le(16))       // PCM fmt chunk size
    b.putShort(1)          // PCM
    b.putShort(1)          // mono
    b.putInt(le(8000))     // sample rate
    b.putInt(le(16000))    // byte rate = rate * block align
    b.putShort(2)          // block align
    b.putShort(16)         // bits per sample
    b.put("data".getBytes("US-ASCII"))
    b.putInt(le(dataSize))
    b.put(data)
    b.array()
  }

  private def u16(a: Array[Byte], off: Int): Int =
    (a(off) & 0xFF) | ((a(off + 1) & 0xFF) << 8)
  private def i32(a: Array[Byte], off: Int): Int =
    (a(off) & 0xFF) | ((a(off + 1) & 0xFF) << 8) |
      ((a(off + 2) & 0xFF) << 16) | ((a(off + 3) & 0xFF) << 24)
  private def tag(a: Array[Byte], off: Int): String =
    new String(a, off, 4, "US-ASCII")

  /** Parse a BMP/WAV header from real bytes; None for anything else. */
  def probe(bytes: Array[Byte]): Option[MediaInfo] =
    probeBmp(bytes).orElse(probeWav(bytes))

  private def probeBmp(a: Array[Byte]): Option[MediaInfo] =
    if (a.length >= 54 && a(0) == 'B' && a(1) == 'M' &&
        i32(a, 2) == a.length &&      // bfSize matches — kills text false-positives
        i32(a, 14) == 40 &&           // BITMAPINFOHEADER
        u16(a, 26) == 1)              // planes
      Some(MediaInfo("bmp",
        width = i32(a, 18).toLong,
        height = math.abs(i32(a, 22)).toLong)) // negative = top-down
    else None

  private def probeWav(a: Array[Byte]): Option[MediaInfo] =
    if (a.length >= 44 && tag(a, 0) == "RIFF" &&
        i32(a, 4) == a.length - 8 &&  // RIFF size matches — kills false-positives
        tag(a, 8) == "WAVE") {
      // walk the chunk list: fmt and data may sit in any order with
      // other chunks (LIST/fact) between them
      var off = 12
      var rate = -1L; var ch = -1L; var bits = -1L; var dataBytes = -1L
      var ok = true
      while (ok && off + 8 <= a.length) {
        val id = tag(a, off); val size = i32(a, off + 4)
        // untrusted input: a negative or over-long size field would stall
        // the walk or index out of bounds — reject the whole payload
        if (size < 0 || off.toLong + 8L + size.toLong > a.length.toLong) ok = false
        else {
          if (id == "fmt " && off + 8 + 16 <= a.length) {
            ch = u16(a, off + 10).toLong
            rate = i32(a, off + 12).toLong
            bits = u16(a, off + 22).toLong
          } else if (id == "data") dataBytes = size.toLong
          off += 8 + size + (size & 1) // chunks are word-aligned
        }
      }
      if (ok && rate > 0 && ch > 0 && bits >= 8 && dataBytes >= 0)
        Some(MediaInfo("wav", sampleRate = rate, channels = ch,
          nSamples = dataBytes / (ch * bits / 8)))
      else None
    } else None
}
