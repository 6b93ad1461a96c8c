package graft.ext

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class PhashSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.session

  private val mediaSchema = StructType(Seq(
    StructField("media_id", LongType),
    StructField("kind", StringType),
    StructField("payload", BinaryType)))

  private def mediaDf(rows: (Long, Array[Byte])*) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map { case (id, p) =>
        Row(id, "image", p) }, 2), mediaSchema)

  /** 16×8 gradient image with controlled bytes (all < 224 ⇒ +16 never
    * saturates): pixel value alternates by column parity. */
  private def gradientImage(seed: Int): Array[Byte] = {
    val w = 16; val h = 8
    val rgb = new Array[Byte](w * h * 3)
    for (y <- 0 until h; x <- 0 until w; c <- 0 until 3)
      rgb((y * w + x) * 3 + c) =
        (((x * 37 + y * 11 + c * 5 + seed) % 200) + 10).toByte
    MediaCodec.encodePpm(w, h, rgb)
  }

  test("dHash is invariant under unsaturated brightness shift") {
    val media = mediaDf(0L -> gradientImage(0), 1L -> gradientImage(3))
    val shifted = Phash.brighten(media, delta = 16)
    val h = Phash.dhashBands(media.unionByName(shifted)).collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4)))
      .toMap
    // no byte exceeds 223, so +16 never saturates ⇒ every gradient sign
    // is preserved ⇒ identical hash (the dHash robustness property)
    assert(h(0L) == h(-1L))
    assert(h(1L) == h(-2L))
    // different content ⇒ different hash
    assert(h(0L) != h(1L))
  }

  test("nearDupPairs finds shifted variants and rejects unrelated images") {
    val media = mediaDf((0L to 7L).map(i => i -> gradientImage(i.toInt * 17)): _*)
    val corpus = media.unionByName(Phash.brighten(media, delta = 16))
    val pairs = Phash.nearDupPairs(Phash.dhashBands(corpus), maxDist = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    // every original pairs with exactly its own variant at distance 0
    val expected = (0L to 7L).map(i => (-i - 1, i, 0)).toSet
    assert(pairs.toSet == expected,
      s"got ${pairs.sorted.mkString(", ")}")
  }

  test("LSH contract: a pair flipped in all four bands is not a candidate") {
    val hashSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("band0", IntegerType), StructField("band1", IntegerType),
      StructField("band2", IntegerType), StructField("band3", IntegerType)))
    // Hamming distance 4 — under the maxDist=6 cut — but one bit differs
    // in EVERY band, so no band bucket is shared and band-LSH must not
    // surface the pair: recall < 1 by design, the documented trade the
    // text MinHash family makes too.
    val rows = Seq(
      Row(1L, 0x0001, 0x0002, 0x0004, 0x0008),
      Row(2L, 0x0000, 0x0000, 0x0000, 0x0000))
    val hashes = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), hashSchema)
    assert(Phash.nearDupPairs(hashes, maxDist = 6).count() == 0)
    // sharing a single band is enough to become a candidate
    val rows2 = Seq(
      Row(1L, 0x0001, 0x0002, 0x0004, 0x0000),
      Row(2L, 0x0000, 0x0000, 0x0000, 0x0000))
    val hashes2 = spark.createDataFrame(
      spark.sparkContext.parallelize(rows2, 1), hashSchema)
    val found = Phash.nearDupPairs(hashes2, maxDist = 6).collect()
    assert(found.map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq ==
      Seq((1L, 2L, 3)))
  }

  test("brighten saturates at 255 and re-encodes a decodable container") {
    val w = 16; val h = 8
    val rgb = Array.tabulate(w * h * 3)(i => ((i * 7) % 256).toByte)
    val media = mediaDf(5L -> MediaCodec.encodePpm(w, h, rgb))
    val out = Phash.brighten(media, delta = 16).collect().head
    assert(out.getLong(0) == -6L)
    val (ow, oh, orgb) = MediaCodec.decodePpm(out.getAs[Array[Byte]](2))
    assert((ow, oh) == (w, h))
    orgb.zip(rgb).foreach { case (b, a) =>
      assert((b & 0xff) == math.min((a & 0xff) + 16, 255))
    }
  }
}
