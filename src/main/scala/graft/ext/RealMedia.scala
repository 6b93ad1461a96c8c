package graft.ext

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/**
 * REAL media decode over the [[Multimodal]] plumbing: payloads are
 * actual P6 PPM images / concatenated-P6 "videos" / PCM16 WAV clips
 * (see [[MediaCodec]]), synthesized deterministically from an id so the
 * pipeline is reproducible and oracle-checkable — the pixel/sample
 * content is an md5 block chain (`md5(s"$id:$blockIdx")`) that a SQL
 * oracle REGENERATES with its own `md5()`, while the Spark side only
 * sees the encoded container bytes and must genuinely parse them. A
 * hash match therefore proves decode ∘ encode preserved the content,
 * not that two stubs agree.
 *
 * Scale shape: synthesis and decode are per-row transforms behind
 * `mapPartitions` (one MessageDigest per partition, the real-codec init
 * amortization point) — no shuffle anywhere.
 */
object RealMedia {

  // content-size parameters, shared with every oracle:
  //   image: 16 × (4 + 2·(id mod 5)) px  → 48·h bytes = 3·h md5 blocks
  //   audio: rate 8000 + 4000·(id mod 4), 16·(2 + id mod 3) samples
  //   video: 2 + (id mod 4) frames of 16×4 px (192 bytes = 12 blocks each)
  def imageHeight(id: Long): Int = 4 + 2 * (id % 5).toInt
  def audioRate(id: Long): Int = 8000 + 4000 * (id % 4).toInt
  def audioSamples(id: Long): Int = 16 * (2 + (id % 3).toInt)
  def videoFrames(id: Long): Int = 2 + (id % 4).toInt
  val ImageW = 16
  val FrameW = 16
  val FrameH = 4

  /** The md5 block chain: byte stream = md5("id:0") ++ md5("id:1") ++ … */
  private def chain(md: MessageDigest, id: Long, nBytes: Int): Array[Byte] = {
    require(nBytes % 16 == 0, "chain length must be whole blocks")
    val out = new Array[Byte](nBytes)
    var b = 0
    while (b * 16 < nBytes) {
      md.reset()
      val block = md.digest(s"$id:$b".getBytes(StandardCharsets.UTF_8))
      System.arraycopy(block, 0, out, b * 16, 16)
      b += 1
    }
    out
  }

  private def pcm(bytes: Array[Byte]): Array[Short] = {
    val out = new Array[Short](bytes.length / 2)
    var j = 0
    while (j < out.length) {
      out(j) = (((bytes(2 * j + 1) & 0xff) << 8) | (bytes(2 * j) & 0xff)).toShort
      j += 1
    }
    out
  }

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("kind", StringType),
    StructField("payload", BinaryType)))

  /** Deterministic REAL containers per id: kind = id mod 3 → image /
    * audio / video (the same mapping as the stub synthesizer). */
  def synthesize(df: DataFrame, idCol: String): DataFrame =
    df.sparkSession.createDataFrame(
      df.select(idCol).rdd.mapPartitions { rows =>
        val md = MessageDigest.getInstance("MD5") // per-partition init
        rows.map { r =>
          val id = r.getLong(0)
          (id % 3) match {
            case 0 =>
              val h = imageHeight(id)
              Row(id, "image",
                MediaCodec.encodePpm(ImageW, h, chain(md, id, ImageW * h * 3)))
            case 1 =>
              Row(id, "audio", MediaCodec.encodeWav(audioRate(id),
                pcm(chain(md, id, audioSamples(id) * 2))))
            case _ =>
              val k = videoFrames(id)
              val stream = chain(md, id, k * FrameW * FrameH * 3)
              val frames = (0 until k).map { f =>
                MediaCodec.encodePpm(FrameW, FrameH,
                  java.util.Arrays.copyOfRange(stream, f * 192, (f + 1) * 192))
              }
              Row(id, "video", frames.reduce(_ ++ _))
          }
        }
      }, mediaSchema)

  val probeSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("kind", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_frames", IntegerType),
    StructField("sample_rate", IntegerType),
    StructField("sum_b", LongType),
    StructField("n_b", LongType)))

  /** One decode pass per payload: container metadata from the REAL header
    * parse plus the exact integer sum/count of the decoded content bytes
    * (pixels / PCM bytes) — integers so the oracle compare is exact. The
    * content sums are what prove decoding actually recovered the payload:
    * header fields alone could be faked from the id formulas. */
  def probeAll(media: DataFrame): DataFrame =
    media.sparkSession.createDataFrame(
      media.select("media_id", "kind", "payload").rdd.mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0); val kind = r.getString(1)
          val p = r.getAs[Array[Byte]](2)
          if (kind == "audio") {
            val (rate, samples) = MediaCodec.decodeWav(p)
            var s = 0L
            samples.foreach { x => val u = x & 0xffff; s += (u & 0xff) + (u >> 8) }
            Row(id, kind, 0, 0, 0, rate, s, samples.length * 2L)
          } else {
            val frames = MediaCodec.decodePpmFrames(p)
            var s = 0L; var n = 0L
            frames.foreach(f => f._3.foreach { b => s += (b & 0xff); n += 1 })
            Row(id, kind, frames.head._1, frames.head._2, frames.length, 0, s, n)
          }
        }
      }, probeSchema)

  val wavSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("sample_rate", IntegerType),
    StructField("n_samples", IntegerType),
    StructField("sum_abs", LongType),
    StructField("peak", IntegerType)))

  /** Real PCM stats: RIFF walk + signed-sample arithmetic, all integer. */
  def wavStats(media: DataFrame): DataFrame =
    media.sparkSession.createDataFrame(
      media.select("media_id", "payload").rdd.mapPartitions { rows =>
        rows.map { r =>
          val (rate, samples) = MediaCodec.decodeWav(r.getAs[Array[Byte]](1))
          var sumAbs = 0L; var peak = 0
          samples.foreach { x =>
            val a = math.abs(x.toInt); sumAbs += a; if (a > peak) peak = a
          }
          Row(r.getLong(0), rate, samples.length, sumAbs, peak)
        }
      }, wavSchema)

  val frameStatSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("frame_idx", IntegerType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("sum_b", LongType)))

  /** Demux → stride-sample → per-frame pixel sums, through the SAME
    * [[Multimodal.sampleFramesAll]] plumbing the stub used (decoder
    * swapped, plan unchanged) — then one more real decode of each
    * re-encoded frame. */
  def frameStats(media: DataFrame, everyN: Int): DataFrame = {
    val sampled = Multimodal.sampleFramesAll(media, everyN, RealDecoder)
    media.sparkSession.createDataFrame(
      sampled.rdd.mapPartitions { rows =>
        rows.map { r =>
          val (w, h, rgb) = MediaCodec.decodePpm(r.getAs[Array[Byte]](2))
          var s = 0L
          rgb.foreach(b => s += (b & 0xff))
          Row(r.getLong(0), r.getInt(1), w, h, s)
        }
      }, frameStatSchema)
  }

  /** Real decoder behind the SAME [[Multimodal.Decoder]] contract the
    * stub implements — swapping it in changes no plan, which was the
    * design claim. Format is sniffed from the container magic. */
  object RealDecoder extends Multimodal.Decoder {
    private def isPpm(p: Array[Byte]) = p.length >= 2 && p(0) == 'P' && p(1) == '6'

    def probe(kind: String, payload: Array[Byte]): (Int, Int, Int, Int) =
      if (isPpm(payload)) {
        val frames = MediaCodec.decodePpmFrames(payload)
        (frames.head._1, frames.head._2, frames.length, 0)
      } else {
        val (rate, samples) = MediaCodec.decodeWav(payload)
        (0, 0, 0, rate) // metadata contract: audio carries only the rate
      }

    def resize(payload: Array[Byte], w: Int, h: Int): Array[Byte] = {
      val (sw, sh, rgb) = MediaCodec.decodePpm(payload)
      MediaCodec.encodePpm(w, h, MediaCodec.resizeNearest(sw, sh, rgb, w, h))
    }

    def sampleFrames(payload: Array[Byte], everyN: Int): Array[Array[Byte]] =
      MediaCodec.decodePpmFrames(payload).zipWithIndex
        .collect { case ((w, h, rgb), i) if i % math.max(1, everyN) == 0 =>
          MediaCodec.encodePpm(w, h, rgb)
        }.toArray

    def features(payload: Array[Byte], dim: Int): Array[Double] =
      if (isPpm(payload)) {
        // mean intensity per equal slice of the (all-frames) pixel stream
        val bytes = MediaCodec.decodePpmFrames(payload).toArray.flatMap(_._3)
        slice(bytes.map(b => (b & 0xff).toDouble), dim).map(_ / 255.0)
      } else {
        val (_, samples) = MediaCodec.decodeWav(payload)
        slice(samples.map(s => math.abs(s.toDouble)), dim).map(_ / 32768.0)
      }

    private def slice(xs: Array[Double], dim: Int): Array[Double] =
      Array.tabulate(dim) { d =>
        val lo = d * xs.length / dim
        val hi = math.min(math.max(lo + 1, (d + 1) * xs.length / dim), xs.length)
        if (lo >= hi) 0.0 // payload shorter than dim: empty slice, not NaN
        else {
          var s = 0.0; var i = lo
          while (i < hi) { s += xs(i); i += 1 }
          s / (hi - lo)
        }
      }
  }
}
