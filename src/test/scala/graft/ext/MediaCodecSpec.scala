package graft.ext

import org.scalatest.funsuite.AnyFunSuite

class MediaCodecSpec extends AnyFunSuite {

  private def rgbOf(w: Int, h: Int, seed: Int): Array[Byte] =
    Array.tabulate(w * h * 3)(i => ((i * 31 + seed * 17) % 256).toByte)

  test("P6 round-trip: decode(encode) is identity across sizes") {
    for ((w, h) <- Seq((1, 1), (16, 4), (7, 13), (64, 64))) {
      val rgb = rgbOf(w, h, w + h)
      val (dw, dh, drgb) = MediaCodec.decodePpm(MediaCodec.encodePpm(w, h, rgb))
      assert((dw, dh) === (w, h))
      assert(drgb === rgb)
    }
  }

  test("P6 header grammar: comments and extra whitespace parse like real netpbm") {
    val rgb = rgbOf(2, 2, 3)
    val bytes = "P6\n# a comment\n 2\t2\n# more\n255\n"
      .getBytes("US-ASCII") ++ rgb
    val (w, h, drgb) = MediaCodec.decodePpm(bytes)
    assert((w, h) === (2, 2))
    assert(drgb === rgb)
  }

  test("concatenated-P6 demux walks frame boundaries exactly") {
    val frames = (0 until 4).map(f => (3 + f, 2, rgbOf(3 + f, 2, f)))
    val stream = frames.map { case (w, h, rgb) => MediaCodec.encodePpm(w, h, rgb) }
      .reduce(_ ++ _)
    val out = MediaCodec.decodePpmFrames(stream)
    assert(out.map(f => (f._1, f._2)) === frames.map(f => (f._1, f._2)))
    out.zip(frames).foreach { case (got, exp) => assert(got._3 === exp._3) }
  }

  test("nearest-neighbor resize: exact source-index mapping, identity at same size") {
    val rgb = rgbOf(4, 4, 9)
    assert(MediaCodec.resizeNearest(4, 4, rgb, 4, 4) === rgb)
    val down = MediaCodec.resizeNearest(4, 4, rgb, 2, 2)
    // output (y,x) pulls source (y*4/2=2y, 2x)
    for (y <- 0 until 2; x <- 0 until 2; c <- 0 until 3)
      assert(down((y * 2 + x) * 3 + c) === rgb(((2 * y) * 4 + 2 * x) * 3 + c))
  }

  test("WAV round-trip: RIFF walk recovers rate and signed samples") {
    val samples = Array.tabulate(48)(i => ((i * 1291 - 24000) % 32768).toShort)
    val (rate, got) = MediaCodec.decodeWav(MediaCodec.encodeWav(22050, samples))
    assert(rate === 22050)
    assert(got === samples)
  }

  test("WAV decode skips unknown chunks between fmt and data (real-world layout)") {
    val samples = Array.tabulate(8)(i => (i * 1000).toShort)
    val canonical = MediaCodec.encodeWav(8000, samples)
    // splice a LIST chunk between fmt (ends at 36) and data
    val junk = "LIST".getBytes("US-ASCII") ++
      Array[Byte](6, 0, 0, 0) ++ "INFOab".getBytes("US-ASCII")
    val spliced = canonical.take(36) ++ junk ++ canonical.drop(36)
    val (rate, got) = MediaCodec.decodeWav(spliced)
    assert(rate === 8000)
    assert(got === samples)
  }

  test("the Decoder contract composes with the JDK's real PNG codec (javax.imageio)") {
    // prove the swap-in claim with a codec we did NOT write: raster →
    // PNG-encode via ImageIO → PNG-decode via ImageIO → same pixels.
    val (w, h) = (16, 8)
    val rgb = rgbOf(w, h, 5)
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val i = (y * w + x) * 3
      img.setRGB(x, y, ((rgb(i) & 0xff) << 16) | ((rgb(i + 1) & 0xff) << 8) | (rgb(i + 2) & 0xff))
    }
    val buf = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "png", buf), "JDK PNG writer unavailable")
    val back = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(buf.toByteArray))
    assert(back.getWidth === w && back.getHeight === h)
    for (y <- 0 until h; x <- 0 until w) {
      val i = (y * w + x) * 3
      val px = back.getRGB(x, y)
      assert(((px >> 16) & 0xff) === (rgb(i) & 0xff))
      assert(((px >> 8) & 0xff) === (rgb(i + 1) & 0xff))
      assert((px & 0xff) === (rgb(i + 2) & 0xff))
    }
  }

  test("RealDecoder probe/resize/frames/features run the real codecs end-to-end") {
    val rgb = rgbOf(16, 4, 1)
    val image = MediaCodec.encodePpm(16, 4, rgb)
    assert(RealMedia.RealDecoder.probe("image", image) === ((16, 4, 1, 0)))
    val resized = RealMedia.RealDecoder.resize(image, 8, 2)
    val (rw, rh, rr) = MediaCodec.decodePpm(resized)
    assert((rw, rh) === (8, 2) && rr.length === 8 * 2 * 3)

    val video = image ++ MediaCodec.encodePpm(16, 4, rgbOf(16, 4, 2)) ++
      MediaCodec.encodePpm(16, 4, rgbOf(16, 4, 3))
    assert(RealMedia.RealDecoder.probe("video", video) === ((16, 4, 3, 0)))
    assert(RealMedia.RealDecoder.sampleFrames(video, 2).length === 2) // frames 0, 2

    val wav = MediaCodec.encodeWav(16000, Array.tabulate(32)(i => (i * 700).toShort))
    assert(RealMedia.RealDecoder.probe("audio", wav) === ((0, 0, 0, 16000)))
    val feats = RealMedia.RealDecoder.features(wav, 4)
    assert(feats.length === 4 && feats.forall(f => f >= 0.0 && f <= 1.0))
  }

  test("decodeWav rejects a chunk whose declared size overruns the payload") {
    val wav = MediaCodec.encodeWav(8000, Array.tabulate(16)(i => (i * 500).toShort))
    val truncated = wav.take(wav.length - 10) // data chunk now overruns
    val e = intercept[IllegalArgumentException](MediaCodec.decodeWav(truncated))
    assert(e.getMessage.contains("truncated WAV"))
  }

  test("decodeWav skips an odd-size junk chunk (pad byte honoured)") {
    val wav = MediaCodec.encodeWav(8000, Array.tabulate(8)(i => (i * 400).toShort))
    // splice a 3-byte 'junk' chunk (odd size => 1 pad byte) after the WAVE tag
    val junk = "junk".getBytes ++ Array[Byte](3, 0, 0, 0) ++ Array[Byte](1, 2, 3, 0)
    val spliced = wav.take(12) ++ junk ++ wav.drop(12)
    // fix the RIFF size field (bytes 4..7, little-endian)
    val riffSize = spliced.length - 8
    for (i <- 0 until 4) spliced(4 + i) = ((riffSize >> (8 * i)) & 0xff).toByte
    val (rate, samples) = MediaCodec.decodeWav(spliced)
    assert(rate === 8000 && samples.length === 8)
  }

  test("features on a payload shorter than dim yields values, never NaN") {
    // 2 samples spread across 16 slices: repeats, not division-by-zero
    val tiny = MediaCodec.encodeWav(8000, Array[Short](100, -200))
    val feats = RealMedia.RealDecoder.features(tiny, 16)
    assert(feats.length === 16 && feats.forall(f => !f.isNaN))
    // the degenerate zero-sample clip: every slice is empty -> 0.0, not NaN
    val empty = MediaCodec.encodeWav(8000, Array.empty[Short])
    val zfeats = RealMedia.RealDecoder.features(empty, 8)
    assert(zfeats.length === 8 && zfeats.forall(_ == 0.0))
  }
}
