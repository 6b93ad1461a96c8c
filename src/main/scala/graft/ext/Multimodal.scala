package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Multimodal column plumbing: image/audio/video as opaque `binary` columns
 * with typed metadata, processed batch-wise per partition. The Spark-side
 * plumbing — schema, partitioning, per-partition batch shape — is real and
 * tested; the actual media decode is STUBBED with a deterministic fake
 * (===> no image/audio codecs exist in this container <===). Swap
 * `StubDecoder` for a real codec (JNI/javacv) without touching the plan.
 */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("kind", StringType),
    StructField("payload", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("n_frames", IntegerType),
      StructField("sample_rate", IntegerType))))))

  /** Deterministic fake payload: media bytes derived from the id. Stands in
    * for real files so the binary-column plumbing is exercised end-to-end. */
  def synthesizeMedia(df: DataFrame, idCol: String): DataFrame = {
    val kind = element_at(array(lit("image"), lit("audio"), lit("video")),
      (pmod(col(idCol), lit(3)) + 1).cast("int"))
    df.select(
      col(idCol).cast(LongType).as("media_id"),
      kind.as("kind"),
      // payload = unhexed md5 of the id — 16 deterministic bytes
      unhex(md5(col(idCol).cast("string"))).as("payload"))
  }

  /** Decoder contract: bytes → typed metadata / transformed bytes. */
  trait Decoder extends Serializable {
    def probe(kind: String, payload: Array[Byte]): (Int, Int, Int, Int) // w, h, frames, sampleRate
    def resize(payload: Array[Byte], w: Int, h: Int): Array[Byte]
    def sampleFrames(payload: Array[Byte], everyN: Int): Array[Array[Byte]]
    def features(payload: Array[Byte], dim: Int): Array[Double] // embedding model stand-in
  }

  /** STUB decoder — deterministic fake measurements from the payload bytes.
    * Real implementation would parse image headers / containers here. */
  object StubDecoder extends Decoder {
    private def b(p: Array[Byte], i: Int): Int = p(i % p.length) & 0xff
    def probe(kind: String, payload: Array[Byte]): (Int, Int, Int, Int) = kind match {
      case "image" => (16 + b(payload, 0) * 4, 16 + b(payload, 1) * 4, 1, 0)
      case "audio" => (0, 0, 0, 8000 + b(payload, 2) * 128)
      case _       => (16 + b(payload, 0) * 4, 16 + b(payload, 1) * 4, 1 + b(payload, 3), 0)
    }
    def resize(payload: Array[Byte], w: Int, h: Int): Array[Byte] =
      payload.take(8) ++ Array((w & 0xff).toByte, (h & 0xff).toByte) // fake: header rewrite
    def sampleFrames(payload: Array[Byte], everyN: Int): Array[Array[Byte]] =
      payload.grouped(math.max(1, everyN)).toArray
    def features(payload: Array[Byte], dim: Int): Array[Double] =
      // fake embedding: centered/scaled payload bytes (a real model would
      // run inference here); deterministic so downstream similarity ops
      // are reproducible and oracle-checkable
      Array.tabulate(dim)(j => (b(payload, j) - 127.5) / 127.5)
  }

  /** Per-partition metadata extraction: the decode runs batch-wise inside
    * `mapPartitions` (the Scala analogue of `mapInPandas` batch shape) so a
    * real codec amortizes init cost per partition, not per row. */
  def extractMeta(df: DataFrame, decoder: Decoder = StubDecoder): DataFrame = {
    val spark = df.sparkSession
    val out = df.sparkSession.createDataFrame(
      df.select("media_id", "kind", "payload").rdd.mapPartitions { rows =>
        // per-partition init point for a real codec
        rows.map { r =>
          val (w, h, f, sr) = decoder.probe(r.getString(1), r.getAs[Array[Byte]](2))
          Row(r.getLong(0), r.getString(1), r.getAs[Array[Byte]](2), Row(w, h, f, sr))
        }
      }, mediaSchema)
    out
  }

  /** Feature extraction: media payload → embedding column, batch-wise per
    * partition (where a real vision/audio model would run, its session
    * initialized once per partition). Output (media_id, embedding) feeds
    * the `ext.SimSearch` operators directly — media near-dup detection is
    * extractFeatures ∘ nearDupPairs. No shuffle: a pure per-row transform
    * behind a per-partition init point. */
  def extractFeatures(df: DataFrame, dim: Int = 8,
      decoder: Decoder = StubDecoder): DataFrame = {
    val schema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("embedding", ArrayType(DoubleType))))
    df.sparkSession.createDataFrame(
      df.select("media_id", "payload").rdd.mapPartitions { rows =>
        // per-partition init point for a real model runtime
        rows.map(r => Row(r.getLong(0),
          decoder.features(r.getAs[Array[Byte]](1), dim).toSeq))
      }, schema)
  }

  /** Resize pipeline: keeps rows co-partitioned, returns same schema minus
    * meta (a transform, not an aggregation — no shuffle). */
  def resizeAll(df: DataFrame, w: Int, h: Int, decoder: Decoder = StubDecoder): DataFrame = {
    val schema = StructType(Seq(
      StructField("media_id", LongType), StructField("payload", BinaryType)))
    df.sparkSession.createDataFrame(
      df.select("media_id", "payload").rdd.mapPartitions { rows =>
        rows.map(r => Row(r.getLong(0), decoder.resize(r.getAs[Array[Byte]](1), w, h)))
      }, schema)
  }

  /** Frame sampling: one payload row fans out to ⌈len/everyN⌉ frame rows —
    * the shuffle-free explode that turns a video column into per-frame
    * training examples (each frame then flows through extractFeatures /
    * similarity ops like any image). `flatMap` inside `mapPartitions`
    * keeps the real-codec init amortized per partition, and output size
    * is bounded by the sampling stride, not the source frame rate. */
  def sampleFramesAll(df: DataFrame, everyN: Int,
      decoder: Decoder = StubDecoder): DataFrame = {
    val schema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("frame_idx", IntegerType),
      StructField("frame", BinaryType)))
    df.sparkSession.createDataFrame(
      df.select("media_id", "payload").rdd.mapPartitions { rows =>
        // per-partition init point for a real demuxer
        rows.flatMap { r =>
          decoder.sampleFrames(r.getAs[Array[Byte]](1), everyN)
            .iterator.zipWithIndex
            .map { case (f, i) => Row(r.getLong(0), i, f) }
        }
      }, schema)
  }

  /** Overlapped audio windowing: each clip fans out to ⌈len/hop⌉ windows
    * of `win` bytes starting every `hop` bytes (win > hop ⇒ consecutive
    * windows overlap by win−hop — the STFT/wav2vec-style framing). Unlike
    * the codec-bound ops above this needs NO decoder at all: windowing is
    * byte arithmetic, so it runs as a pure column pipeline — sequence →
    * transform → binary substr → posexplode — that stays inside
    * whole-stage codegen and shuffles nothing. The trailing window is
    * truncated at the clip end, never padded. */
  def chunkAudio(df: DataFrame, win: Int, hop: Int): DataFrame = {
    require(win > 0 && hop > 0, "window and hop must be positive")
    val len = length(col("payload"))
    val nChunks = ceil(len.cast(DoubleType) / hop).cast(IntegerType)
    val windows = when(len > 0,
      transform(sequence(lit(0), nChunks - 1),
        j => col("payload").substr(j * hop + 1, lit(win))))
      .otherwise(array().cast(ArrayType(BinaryType)))
    df.select(col("media_id"),
      posexplode(windows).as(Seq("chunk_idx", "chunk")))
      .withColumn("chunk_len", length(col("chunk")))
  }
}
