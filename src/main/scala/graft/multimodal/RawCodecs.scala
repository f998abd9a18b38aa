package graft.multimodal

/** Pure-JVM codecs for RAW container formats — no external codec libraries:
  * PPM (P6) images and PCM-16 mono WAV audio. These make the decode stage of
  * the media pipeline REAL for uncompressed payloads; compressed codecs
  * (JPEG/MP3/H.264) remain behind the declared stub, which is the honest
  * boundary in this sandbox (no libjpeg/ffmpeg available).
  */
object RawCodecs {

  /** P6 PPM: ASCII header `P6 <w> <h> <maxval>` (whitespace/comment
    * separated) followed by one binary RGB triplet per pixel. */
  def decodePpm(bytes: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
    if (bytes.length < 2 || bytes(0) != 'P' || bytes(1) != '6') return None
    var pos = 2
    def skipSpace(): Unit = {
      var go = true
      while (go && pos < bytes.length) {
        val c = bytes(pos)
        if (c == '#') { while (pos < bytes.length && bytes(pos) != '\n') pos += 1 }
        else if (c == ' ' || c == '\t' || c == '\n' || c == '\r') pos += 1
        else go = false
      }
    }
    def int(): Int = {
      skipSpace()
      var v = 0
      var any = false
      while (pos < bytes.length && bytes(pos) >= '0' && bytes(pos) <= '9') {
        v = v * 10 + (bytes(pos) - '0'); pos += 1; any = true
      }
      if (any) v else -1
    }
    val w = int(); val h = int(); val maxVal = int()
    // dimension cap guards the Long product AND adversarial headers claiming
    // giant images (need stays well under Int.MaxValue)
    if (w <= 0 || h <= 0 || w > 16384 || h > 16384 || maxVal != 255 ||
      pos >= bytes.length) return None
    // the byte after maxval MUST be a single whitespace (PPM spec); a
    // malformed header running straight into pixel data would otherwise
    // silently shift every RGB value by one byte
    val sep = bytes(pos)
    if (sep != ' ' && sep != '\t' && sep != '\n' && sep != '\r') return None
    pos += 1
    val need = w.toLong * h * 3
    if (bytes.length - pos < need) None
    else Some((w, h, java.util.Arrays.copyOfRange(bytes, pos, pos + need.toInt)))
  }

  def encodePpm(w: Int, h: Int, rgb: Array[Byte]): Array[Byte] = {
    require(rgb.length == w * h * 3)
    val header = s"P6\n$w $h\n255\n".getBytes("US-ASCII")
    header ++ rgb
  }

  /** RIFF/WAVE, PCM-16 mono little-endian. Walks the RIFF chunk list to
    * locate the `fmt ` and `data` chunks, so legal files with extra chunks
    * (LIST/INFO, fact) or a non-16-byte fmt chunk decode instead of silently
    * falling back to the stub path (chunks are padded to even sizes per the
    * RIFF spec). */
  def decodeWav(bytes: Array[Byte]): Option[(Int, Array[Short])] = {
    def le32(o: Int): Int =
      (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8) |
        ((bytes(o + 2) & 0xff) << 16) | ((bytes(o + 3) & 0xff) << 24)
    def le16(o: Int): Int = (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8)
    def tag(o: Int, s: String): Boolean =
      s.zipWithIndex.forall { case (c, i) => bytes(o + i) == c.toByte }
    if (bytes.length < 12 || !tag(0, "RIFF") || !tag(8, "WAVE")) return None
    var fmtOff = -1
    var dataOff = -1
    var dataLen = 0
    // pos is Long: an adversarial chunk size near Int.MaxValue would
    // overflow an Int cursor PAST the `size < 0` guard and turn the loop
    // bound check into an out-of-bounds read (crashing the Spark task
    // instead of honoring the Option contract)
    var pos = 12L
    while (pos + 8 <= bytes.length && (fmtOff < 0 || dataOff < 0)) {
      val p = pos.toInt
      val size = le32(p + 4)
      if (size < 0) return None // adversarial length field
      if (tag(p, "fmt ") && fmtOff < 0 && size >= 16) fmtOff = p + 8
      if (tag(p, "data") && dataOff < 0) { dataOff = p + 8; dataLen = size }
      pos += 8L + size + (size & 1) // RIFF chunks pad to even length
    }
    if (fmtOff < 0 || dataOff < 0 || fmtOff + 16 > bytes.length) return None
    val audioFormat = le16(fmtOff)
    val channels = le16(fmtOff + 2)
    val sampleRate = le32(fmtOff + 4)
    val bits = le16(fmtOff + 14)
    if (audioFormat != 1 || channels != 1 || bits != 16 || sampleRate <= 0) return None
    // a corrupt/adversarial length field must clamp, not produce a negative
    // array size — the Option contract is what lets callers fall back cleanly
    val safeLen = math.max(0, math.min(dataLen, bytes.length - dataOff))
    val n = safeLen / 2
    val out = new Array[Short](n)
    var i = 0
    while (i < n) {
      out(i) = (((bytes(dataOff + 2 * i) & 0xff)) | (bytes(dataOff + 2 * i + 1) << 8)).toShort
      i += 1
    }
    Some((sampleRate, out))
  }

  def encodeWav(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    val dataLen = samples.length * 2
    val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII")).put("fmt ".getBytes("US-ASCII"))
      .putInt(16).putShort(1).putShort(1).putInt(sampleRate)
      .putInt(sampleRate * 2).putShort(2).putShort(16)
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(buf.putShort)
    buf.array()
  }

  /** 4×4 mean-luminance grid pooling over decoded RGB — a real (if simple)
    * image feature: 16 floats in [0, 1], row-major over grid cells. */
  def poolLuminance(w: Int, h: Int, rgb: Array[Byte], grid: Int = 4): Array[Float] = {
    val sums = new Array[Double](grid * grid)
    val counts = new Array[Long](grid * grid)
    var y = 0
    while (y < h) {
      val gy = math.min(grid - 1, y * grid / h)
      var x = 0
      while (x < w) {
        val gx = math.min(grid - 1, x * grid / w)
        val o = (y * w + x) * 3
        val lum = 0.299 * (rgb(o) & 0xff) + 0.587 * (rgb(o + 1) & 0xff) +
          0.114 * (rgb(o + 2) & 0xff)
        val c = gy * grid + gx
        sums(c) += lum / 255.0
        counts(c) += 1
        x += 1
      }
      y += 1
    }
    Array.tabulate(grid * grid)(c => if (counts(c) == 0) 0f else (sums(c) / counts(c)).toFloat)
  }

  /** Per-window RMS energy over PCM samples: `windows` floats in [0, 1]. */
  def rmsWindows(samples: Array[Short], windows: Int = 16): Array[Float] = {
    if (samples.isEmpty) return new Array[Float](windows)
    Array.tabulate(windows) { wi =>
      val from = samples.length.toLong * wi / windows
      val until = math.max(from + 1, samples.length.toLong * (wi + 1) / windows)
      var s = 0.0
      var i = from
      while (i < until) { val v = samples(i.toInt) / 32768.0; s += v * v; i += 1 }
      math.sqrt(s / (until - from)).toFloat
    }
  }
}
