package graft.ext

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets

/**
 * REAL pure-JVM media codecs — no external libraries, full binary parsing:
 *
 *  - netpbm P6 (binary PPM) images: ASCII header (`P6\n<w> <h>\n255\n`)
 *    followed by `w*h*3` raw RGB bytes. Decode parses the actual header
 *    (whitespace/comment tolerant, the spec's grammar), encode emits the
 *    canonical form. A "video" is the netpbm idiom of CONCATENATED P6
 *    frames in one stream — the demuxer walks frame by frame.
 *  - PCM16LE mono WAV: RIFF container walk (fmt + data chunks located by
 *    id, not by fixed offset — real-world WAVs carry LIST/fact chunks
 *    between them).
 *
 * This upgrades the [[Multimodal]] pillar from stub to real decode for
 * the formats a JVM can own outright; `JdkImageCodecSpec` additionally
 * proves the contract composes with javax.imageio's native PNG codec.
 * At 100 TB none of this changes the plan shape — decode still runs
 * batch-wise inside `mapPartitions` behind the same [[Multimodal.Decoder]]
 * interface.
 */
object MediaCodec {

  // ---- netpbm P6 ---------------------------------------------------------

  def encodePpm(w: Int, h: Int, rgb: Array[Byte]): Array[Byte] = {
    require(rgb.length == w * h * 3, s"rgb length ${rgb.length} != $w*$h*3")
    val header = s"P6\n$w $h\n255\n".getBytes(StandardCharsets.US_ASCII)
    header ++ rgb
  }

  /** Parse ONE P6 image starting at `off`; returns (w, h, rgb, nextOffset).
    * Real header grammar: magic, then three whitespace-separated decimal
    * tokens (width, height, maxval), `#` comments allowed between tokens,
    * single whitespace byte before the raster. */
  def decodePpmAt(bytes: Array[Byte], off: Int): (Int, Int, Array[Byte], Int) = {
    var i = off
    def fail(msg: String) = throw new IllegalArgumentException(s"PPM: $msg at $i")
    if (i + 2 > bytes.length || bytes(i) != 'P' || bytes(i + 1) != '6') fail("bad magic")
    i += 2
    def skipWsAndComments(): Unit = {
      var more = true
      while (more) {
        while (i < bytes.length && (bytes(i) == ' ' || bytes(i) == '\n'
          || bytes(i) == '\r' || bytes(i) == '\t')) i += 1
        if (i < bytes.length && bytes(i) == '#') {
          while (i < bytes.length && bytes(i) != '\n') i += 1
        } else more = false
      }
    }
    def token(): Int = {
      skipWsAndComments()
      val s = i
      while (i < bytes.length && bytes(i) >= '0' && bytes(i) <= '9') i += 1
      if (i == s) fail("expected integer")
      new String(bytes, s, i - s, StandardCharsets.US_ASCII).toInt
    }
    val w = token(); val h = token(); val maxval = token()
    if (maxval != 255) fail(s"unsupported maxval $maxval")
    i += 1 // exactly one whitespace byte separates header from raster
    val n = w * h * 3
    if (i + n > bytes.length) fail(s"truncated raster (need $n)")
    (w, h, java.util.Arrays.copyOfRange(bytes, i, i + n), i + n)
  }

  def decodePpm(bytes: Array[Byte]): (Int, Int, Array[Byte]) = {
    val (w, h, rgb, _) = decodePpmAt(bytes, 0)
    (w, h, rgb)
  }

  /** Demux a concatenated-P6 stream into frames. */
  def decodePpmFrames(bytes: Array[Byte]): Seq[(Int, Int, Array[Byte])] = {
    val out = Seq.newBuilder[(Int, Int, Array[Byte])]
    var off = 0
    while (off < bytes.length) {
      val (w, h, rgb, next) = decodePpmAt(bytes, off)
      out += ((w, h, rgb)); off = next
    }
    out.result()
  }

  /** Nearest-neighbor resize on a decoded raster — source pixel
    * (⌊y·h/oh⌋, ⌊x·w/ow⌋), the standard NN mapping. */
  def resizeNearest(w: Int, h: Int, rgb: Array[Byte], ow: Int, oh: Int): Array[Byte] = {
    val out = new Array[Byte](ow * oh * 3)
    var y = 0
    while (y < oh) {
      val sy = y * h / oh
      var x = 0
      while (x < ow) {
        val sx = x * w / ow
        val si = (sy * w + sx) * 3
        val di = (y * ow + x) * 3
        out(di) = rgb(si); out(di + 1) = rgb(si + 1); out(di + 2) = rgb(si + 2)
        x += 1
      }
      y += 1
    }
    out
  }

  // ---- PCM16LE mono WAV --------------------------------------------------

  def encodeWav(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    val dataLen = samples.length * 2
    val buf = ByteBuffer.allocate(44 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes(StandardCharsets.US_ASCII)).putInt(36 + dataLen)
    buf.put("WAVE".getBytes(StandardCharsets.US_ASCII))
    buf.put("fmt ".getBytes(StandardCharsets.US_ASCII)).putInt(16)
    buf.putShort(1)                 // PCM
    buf.putShort(1)                 // mono
    buf.putInt(sampleRate)
    buf.putInt(sampleRate * 2)      // byte rate = rate * block align
    buf.putShort(2)                 // block align (1 ch × 16 bit)
    buf.putShort(16)                // bits per sample
    buf.put("data".getBytes(StandardCharsets.US_ASCII)).putInt(dataLen)
    samples.foreach(buf.putShort)
    buf.array()
  }

  /** Real RIFF walk: find fmt/data chunks by id (other chunks skipped),
    * honour the declared chunk sizes. Returns (sampleRate, samples). */
  def decodeWav(bytes: Array[Byte]): (Int, Array[Short]) = {
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    def ascii4(): String = {
      val b = new Array[Byte](4); buf.get(b); new String(b, StandardCharsets.US_ASCII)
    }
    require(ascii4() == "RIFF", "not a RIFF file")
    buf.getInt // riff size
    require(ascii4() == "WAVE", "not a WAVE file")
    var sampleRate = -1
    var samples: Array[Short] = null
    while (buf.remaining() >= 8 && (sampleRate < 0 || samples == null)) {
      val id = ascii4(); val size = buf.getInt
      require(size >= 0 && size <= buf.remaining(),
        s"truncated WAV: chunk '$id' declares $size bytes, ${buf.remaining()} remain")
      id match {
        case "fmt " =>
          require(size >= 8, s"fmt chunk too small ($size)")
          val start = buf.position()
          val fmt = buf.getShort; val channels = buf.getShort
          sampleRate = buf.getInt
          require(fmt == 1 && channels == 1, s"only PCM mono supported ($fmt/$channels)")
          buf.position(math.min(start + size + (size & 1), buf.limit()))
        case "data" =>
          val start = buf.position()
          samples = new Array[Short](size / 2)
          var j = 0
          while (j < samples.length) { samples(j) = buf.getShort; j += 1 }
          buf.position(math.min(start + size + (size & 1), buf.limit()))
        case _ => // skip, pad to even (pad byte may be absent at EOF)
          buf.position(math.min(buf.position() + size + (size & 1), buf.limit()))
      }
    }
    require(sampleRate > 0 && samples != null, "missing fmt or data chunk")
    (sampleRate, samples)
  }
}
