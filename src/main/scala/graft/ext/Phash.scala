package graft.ext

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Perceptual-hash near-duplicate detection for IMAGES — the media-side
 * counterpart of the text MinHash/SimHash family ([[Dedup]]): a corpus
 * of decoded rasters is reduced to a 64-bit difference hash (dHash),
 * and near-duplicates are found by 16-bit-band LSH + Hamming distance,
 * never by pairwise image comparison.
 *
 * dHash (public-domain technique: resize to 9×8, compare horizontally
 * adjacent luminances, 64 gradient bits): robust to brightness shifts
 * and re-encoding because it keys on gradient SIGN, not absolute
 * values. Two deliberate determinism choices keep every bit exactly
 * reproducible by a SQL oracle: luminance is the plain channel SUM
 * (r+g+b — monotone in each channel, so gradient signs match any
 * weighted luma for our synthetic rasters, and it is integer-exact),
 * and the resize is [[MediaCodec.resizeNearest]]'s integer
 * nearest-neighbor (`sx = x·w/9`, `sy = y·h/8`).
 *
 * The hash is carried as FOUR 16-bit bands (`band0..band3`, each an
 * INT) rather than one packed 64-bit word: the bands ARE the LSH
 * buckets (a near-dup within Hamming distance d leaves ≥ 4−d bands
 * untouched in the worst case, and in practice flips land in few
 * bands), and 16-bit values can never overflow or go negative in
 * either engine.
 *
 * Scale shape: hashing is a per-row `mapPartitions` transform (codec
 * init amortized per partition, no shuffle). Pairing shuffles the
 * corpus 4× on (band, value) — bucket sizes ~n/2¹⁶ on random content;
 * at larger corpora widen the bands (more, narrower buckets) exactly
 * like the MinHash band calculus in [[Dedup.minhashNearDups]].
 */
object Phash {

  private val GridW = 9
  private val GridH = 8

  private val hashSchema = StructType(Seq(
    StructField("media_id", LongType),
    StructField("band0", IntegerType),
    StructField("band1", IntegerType),
    StructField("band2", IntegerType),
    StructField("band3", IntegerType)))

  /** dHash of each P6 image payload → (media_id, band0..band3). */
  def dhashBands(media: DataFrame): DataFrame = {
    media.sparkSession.createDataFrame(
      media.select("media_id", "payload").rdd.mapPartitions { rows =>
        rows.map { r =>
          val (w, h, rgb) = MediaCodec.decodePpm(r.getAs[Array[Byte]](1))
          val small = MediaCodec.resizeNearest(w, h, rgb, GridW, GridH)
          def gray(x: Int, y: Int): Int = {
            val i = (y * GridW + x) * 3
            (small(i) & 0xff) + (small(i + 1) & 0xff) + (small(i + 2) & 0xff)
          }
          val bands = new Array[Int](4)
          var y = 0
          while (y < GridH) {
            var x = 0
            while (x < GridW - 1) {
              if (gray(x, y) < gray(x + 1, y)) {
                val i = 8 * y + x
                bands(i / 16) |= 1 << (i % 16)
              }
              x += 1
            }
            y += 1
          }
          Row(r.getLong(0), bands(0), bands(1), bands(2), bands(3))
        }
      }, hashSchema)
  }

  /** Brightness-shifted VARIANTS through the real codec: decode, add
    * `delta` to every channel with saturation at 255, re-encode. Variant
    * ids are `-id-1` (collision-free against non-negative ids at any
    * scale). Saturation is monotone non-decreasing, so dHash gradient
    * bits flip only where channels compress into the 255 ceiling — the
    * "slightly edited re-upload" the near-dup operator exists to catch. */
  def brighten(media: DataFrame, delta: Int): DataFrame = {
    val schema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("kind", StringType),
      StructField("payload", BinaryType)))
    media.sparkSession.createDataFrame(
      media.select("media_id", "kind", "payload").rdd.mapPartitions { rows =>
        rows.map { r =>
          val (w, h, rgb) = MediaCodec.decodePpm(r.getAs[Array[Byte]](2))
          val out = new Array[Byte](rgb.length)
          var i = 0
          while (i < rgb.length) {
            out(i) = math.min((rgb(i) & 0xff) + delta, 255).toByte
            i += 1
          }
          Row(-r.getLong(0) - 1, r.getString(1), MediaCodec.encodePpm(w, h, out))
        }
      }, schema)
  }

  /** Near-dup pairs by band LSH: candidates share at least one exact
    * 16-bit band; survivors have Hamming(hash1, hash2) ≤ `maxDist`.
    * Output: (id1 < id2, dist), one row per pair. */
  def nearDupPairs(hashes: DataFrame, maxDist: Int): DataFrame = {
    val bandCols = (0 until 4).map(i => col(s"band$i"))
    val melted = hashes.select(col("media_id"),
      posexplode(array(bandCols: _*)).as(Seq("band_idx", "band_val")))
    val cands = melted.as("a").join(melted.as("b"),
        col("a.band_idx") === col("b.band_idx") &&
          col("a.band_val") === col("b.band_val") &&
          col("a.media_id") < col("b.media_id"))
      .select(col("a.media_id").as("id1"), col("b.media_id").as("id2"))
      .distinct()
    def side(tag: String): DataFrame = hashes.select(
      col("media_id").as(s"${tag}_id") +: (0 until 4).map(i =>
        col(s"band$i").as(s"${tag}_b$i")): _*)
    val dist: Column = (0 until 4).map(i =>
      expr(s"bit_count(h1_b$i ^ h2_b$i)")).reduce(_ + _).cast("int")
    cands.join(side("h1"), col("id1") === col("h1_id"))
      .join(side("h2"), col("id2") === col("h2_id"))
      .withColumn("dist", dist)
      .filter(col("dist") <= maxDist)
      .select("id1", "id2", "dist")
  }
}
