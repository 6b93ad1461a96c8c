package graft.io

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/**
 * The deletion-vector codec against itself (encode ∘ decode identity
 * across every container type the portable RoaringBitmapArray format
 * has) and against the file framing (CRC, length prefix, z85 uuid
 * naming). The byte-level conformance against HAND-authored foreign
 * bytes lives in [[ForeignDeltaSpec]]; this spec pins the WRITER the
 * Delta export uses.
 */
class DeletionVectorSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.session

  test("bitmap array encode/decode round-trips across container types") {
    val cases: Seq[Seq[Long]] = Seq(
      Seq(0L),
      Seq(0L, 2L, 5L), // small array container
      (0L until 5000L), // bitmap container (cardinality > 4096)
      (0L until 5000L).map(_ * 13), // bitmap spread over several keys
      Seq(1L, 70000L, 131071L), // multiple 16-bit keys, array containers
      Seq(5L, (1L << 32) + 7L), // two 32-bit bitmaps (64-bit positions)
      Seq(65535L, 65536L, 131072L) // container boundaries
    )
    cases.foreach { ps =>
      val decoded = DeletionVector.decodeBitmapArray(
        DeletionVector.encodeBitmapArray(ps))
      assert(decoded == ps.distinct.sorted, s"case $ps")
    }
  }

  test("z85 encode/decode round-trips (padding carried out-of-band)") {
    val cases = Seq(
      Array[Byte](1, 2, 3, 4),
      Array[Byte](-1, -128, 0, 127, 5, 6, 7, 8),
      Array.tabulate(30)(i => (i * 7 - 90).toByte) // non-multiple of 4
    )
    cases.foreach { b =>
      val decoded = DeletionVector.decodeZ85(DeletionVector.encodeZ85(b))
      assert(decoded.take(b.length).toSeq == b.toSeq)
    }
  }

  test("writeDvFile is content-addressed, idempotent, and reads back exactly") {
    val dir = java.nio.file.Files.createTempDirectory("dvwrite").toString
    val pos = Seq(3L, 9L, 4096L, 70000L)
    val d1 = DeletionVector.writeDvFile(spark, dir, pos)
    val d2 = DeletionVector.writeDvFile(spark, dir, pos) // same content
    assert(d1 == d2, "content-addressed write must be idempotent")
    assert(d1.cardinality == 4)
    val files = new java.io.File(dir).listFiles
      .filter(_.getName.startsWith("deletion_vector_"))
    assert(files.length == 1)
    // resolve THROUGH the descriptor exactly as the read path does
    val decoded = DeletionVector.positions(spark, dir, "u",
      d1.pathOrInlineDv, Some(d1.offset), d1.sizeInBytes)
    assert(decoded == pos.sorted)
    // a different delete set lands as a second file
    val d3 = DeletionVector.writeDvFile(spark, dir, Seq(1L, 2L))
    assert(d3 != d1)
    assert(new java.io.File(dir).listFiles
      .count(_.getName.startsWith("deletion_vector_")) == 2)
  }
}
