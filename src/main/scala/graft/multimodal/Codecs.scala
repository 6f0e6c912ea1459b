package graft.multimodal

/** REAL media codecs for two public, trivially-verifiable container
  * formats — RIFF/WAVE 16-bit PCM audio and binary PPM (P6) images.
  * Both are simple enough that the parser IS the codec (no external
  * library exists in this environment, and none is needed), which is
  * exactly why they make honest decode kernels: every byte of the
  * container is specified, so a DuckDB oracle can recompute the
  * decoded statistics from the same deterministic payload
  * construction and catch a parsing bug value-for-value.
  *
  * Error discipline: decode failures are LOUD and name the offending
  * field ("data chunk declares 128 bytes but only 96 remain"), never
  * silent zeros — a corrupt payload in a 100 TB curation run must
  * identify itself. Null/too-short payloads fail the same way; the
  * caller ([[Multimodal.extractFeatures]]) chooses fail-fast or
  * quarantine semantics per pipeline.
  */
object WavCodec {

  /** Decoded WAV: format fields + the PCM samples. */
  final case class Wav(
      sampleRate: Int, channels: Int, bitsPerSample: Int,
      samples: Array[Short])

  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(s"WavCodec: $msg")

  private def u16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

  private def u32(b: Array[Byte], off: Int): Long =
    (b(off) & 0xffL) | ((b(off + 1) & 0xffL) << 8) |
      ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)

  private def tag(b: Array[Byte], off: Int): String =
    new String(b, off, 4, java.nio.charset.StandardCharsets.US_ASCII)

  /** Canonical 44-byte-header mono 16-bit PCM encoder. */
  def encodePcm16(samples: Array[Short], sampleRate: Int): Array[Byte] = {
    require(sampleRate > 0, s"sampleRate must be positive: $sampleRate")
    val dataLen = samples.length * 2
    val out = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    out.putInt(36 + dataLen)
    out.put("WAVE".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    out.put("fmt ".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    out.putInt(16)        // PCM fmt chunk size
    out.putShort(1)       // audioFormat = PCM
    out.putShort(1)       // mono
    out.putInt(sampleRate)
    out.putInt(sampleRate * 2) // byteRate = rate * blockAlign
    out.putShort(2)       // blockAlign = channels * bytes/sample
    out.putShort(16)      // bitsPerSample
    out.put("data".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    out.putInt(dataLen)
    samples.foreach(out.putShort)
    out.array()
  }

  /** Chunk-walking RIFF/WAVE parser: validates the RIFF envelope,
    * requires a PCM `fmt ` chunk and a fully-present even-length
    * `data` chunk, SKIPS unknown chunks (LIST/INFO/fact — real WAV
    * writers emit them), and rejects anything it would otherwise
    * misread: non-PCM encodings, bit depths other than 16, truncated
    * or overhanging data.
    */
  def decode(bytes: Array[Byte]): Wav = {
    if (bytes == null) fail("payload is null")
    if (bytes.length < 12)
      fail(s"payload too short for a RIFF header: ${bytes.length} bytes")
    if (tag(bytes, 0) != "RIFF") fail(s"bad magic '${tag(bytes, 0)}', want 'RIFF'")
    if (tag(bytes, 8) != "WAVE") fail(s"bad RIFF form '${tag(bytes, 8)}', want 'WAVE'")
    val declared = u32(bytes, 4)
    if (declared + 8 != bytes.length.toLong)
      fail(s"RIFF declares ${declared + 8} total bytes but payload has ${bytes.length}")
    var off = 12
    var fmt: Option[(Int, Int, Int)] = None // (audioFormat, channels, bits)
    var rate = 0
    var data: Option[(Int, Int)] = None // (offset, length)
    while (off + 8 <= bytes.length) {
      val id = tag(bytes, off)
      val size = u32(bytes, off + 4)
      if (size > Int.MaxValue || off + 8 + size > bytes.length)
        fail(s"chunk '$id' declares $size bytes but only ${bytes.length - off - 8} remain")
      val body = off + 8
      id match {
        case "fmt " =>
          if (size < 16) fail(s"fmt chunk too short: $size bytes, want >= 16")
          fmt = Some((u16(bytes, body), u16(bytes, body + 2), u16(bytes, body + 14)))
          rate = u32(bytes, body + 4).toInt
        case "data" => data = Some((body, size.toInt))
        case _ => // LIST/INFO/fact/...: skip
      }
      off = body + size.toInt + (size.toInt & 1) // chunks pad to even
    }
    val (audioFormat, channels, bits) = fmt.getOrElse(fail("no 'fmt ' chunk"))
    if (audioFormat != 1)
      fail(s"unsupported audio format $audioFormat (only PCM=1)")
    if (bits != 16) fail(s"unsupported bit depth $bits (only 16-bit PCM)")
    if (channels < 1) fail(s"channel count must be >= 1: $channels")
    if (rate <= 0) fail(s"sample rate must be positive: $rate")
    val (dOff, dLen) = data.getOrElse(fail("no 'data' chunk"))
    if (dLen % 2 != 0) fail(s"16-bit data chunk has odd length $dLen")
    val n = dLen / 2
    val samples = new Array[Short](n)
    var i = 0
    while (i < n) {
      samples(i) = ((bytes(dOff + 2 * i) & 0xff) |
        (bytes(dOff + 2 * i + 1) << 8)).toShort
      i += 1
    }
    Wav(rate, channels, bits, samples)
  }
}

/** Binary PPM (P6) codec — ASCII header (`P6`, width, height, maxval,
  * `#` comments allowed in the header per the netpbm spec) followed by
  * 3·w·h RGB bytes. Same loud-error discipline as [[WavCodec]].
  */
object PpmCodec {

  /** Decoded P6 image: dimensions, max channel value, raw RGB bytes
    * (row-major, 3 bytes per pixel). */
  final case class Ppm(width: Int, height: Int, maxval: Int, pixels: Array[Byte])

  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(s"PpmCodec: $msg")

  def encodeP6(width: Int, height: Int, rgb: Array[Byte]): Array[Byte] = {
    require(width > 0 && height > 0, s"dimensions must be positive: ${width}x$height")
    require(rgb.length == 3 * width * height,
      s"pixel buffer has ${rgb.length} bytes, want 3*$width*$height = ${3 * width * height}")
    val header = s"P6\n$width $height\n255\n"
      .getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    val out = new Array[Byte](header.length + rgb.length)
    System.arraycopy(header, 0, out, 0, header.length)
    System.arraycopy(rgb, 0, out, header.length, rgb.length)
    out
  }

  def decode(bytes: Array[Byte]): Ppm = {
    if (bytes == null) fail("payload is null")
    if (bytes.length < 2) fail(s"payload too short for a magic: ${bytes.length} bytes")
    if (!(bytes(0) == 'P' && bytes(1) == '6'))
      fail(s"bad magic '${bytes(0).toChar}${bytes(1).toChar}', want 'P6'")
    var off = 2
    def isWs(b: Byte) = b == ' ' || b == '\t' || b == '\n' || b == '\r'
    // header tokens separated by whitespace; '#' starts a comment to EOL
    def nextInt(field: String): Int = {
      var commenting = false
      while (off < bytes.length &&
        (commenting || isWs(bytes(off)) || bytes(off) == '#')) {
        if (bytes(off) == '#') commenting = true
        else if (bytes(off) == '\n') commenting = false
        off += 1
      }
      val start = off
      while (off < bytes.length && bytes(off) >= '0' && bytes(off) <= '9') off += 1
      if (off == start) fail(s"missing or non-numeric $field in header")
      val v = new String(bytes, start, off - start,
        java.nio.charset.StandardCharsets.US_ASCII)
      if (v.length > 9) fail(s"$field '$v' out of range")
      v.toInt
    }
    val width = nextInt("width")
    val height = nextInt("height")
    val maxval = nextInt("maxval")
    if (width <= 0 || height <= 0)
      fail(s"dimensions must be positive: ${width}x$height")
    if (maxval <= 0 || maxval > 255)
      fail(s"unsupported maxval $maxval (1-byte samples require 1..255)")
    // exactly ONE whitespace byte separates the header from the raster
    if (off >= bytes.length || !isWs(bytes(off)))
      fail("missing whitespace between maxval and raster")
    off += 1
    // Long math: 9-digit dims pass nextInt but 3*w*h can wrap Int —
    // reject out-of-range sizes before any raster-length comparison so
    // a wrap collision can never decode inconsistent dimensions.
    val needL = 3L * width * height
    if (needL > Int.MaxValue)
      fail(s"dimensions out of range: 3*$width*$height = $needL exceeds 1-buffer limit")
    val need = needL.toInt
    val have = bytes.length - off
    if (have != need)
      fail(s"raster has $have bytes, want 3*$width*$height = $need")
    val px = new Array[Byte](need)
    System.arraycopy(bytes, off, px, 0, need)
    Ppm(width, height, maxval, px)
  }
}
