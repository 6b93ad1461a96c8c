package graft.io

import java.nio.{ByteBuffer, ByteOrder}
import java.util.UUID

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/**
 * Delta Lake DELETION VECTOR decode — read path only (VERDICT r7
 * item 8): the merge-on-read encoding foreign Delta writers use for
 * DELETE/UPDATE, per the PUBLIC spec (delta-io/delta PROTOCOL.md,
 * "Deletion Vectors" + the RoaringBitmap interchange format,
 * RoaringBitmap/RoaringFormatSpec). This is the single most common
 * foreign-Delta feature the read guards trip on; with this decoder the
 * full-table read path applies DVs instead of refusing.
 *
 * Layout decoded here:
 *
 *  - descriptor (`add.deletionVector`): `storageType` `u` (relative
 *    file, name = Z85-encoded UUID with an optional random prefix),
 *    `p` (absolute path), or `i` (inline, Z85-encoded data);
 *    `offset` (byte position of the DV's length prefix inside the
 *    file), `sizeInBytes` (length of the bitmap data), `cardinality`.
 *  - DV file: begins with a format-version byte (1); at `offset`: a
 *    4-byte BIG-endian data length (must equal `sizeInBytes`), the
 *    bitmap data, then a 4-byte big-endian CRC-32 of the data —
 *    verified here, a torn DV must fail loudly, not drop rows.
 *  - bitmap data ("portable" RoaringBitmapArray): 4-byte LITTLE-endian
 *    magic 1681511377, 8-byte LE bitmap count, then each 32-bit
 *    RoaringBitmap in index order in the STANDARD portable format:
 *    cookie 12346 (no runs; container count follows as 4-byte LE) or
 *    12347 (runs; count in the cookie's high 16 bits + a run-flag
 *    bitset), descriptive header of (key, cardinality−1) uint16 pairs,
 *    an offset header (ignored — containers read sequentially), then
 *    array (uint16 values), bitmap (8 KiB bitset), or run
 *    (count + (start, length−1) pairs) containers.
 *
 * Everything is metadata-scale (a DV is KBs per file by design), so a
 * driver-side decode is the right cost model; the positions feed the
 * same broadcast anti-join the engine's own MOR reader uses.
 */
object DeletionVector {

  /** Z85 alphabet (ZeroMQ spec 32/Z85 — the variant Delta names). */
  private val Z85Alphabet =
    "0123456789abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ" +
      ".-:+=^!/*?&<>()[]{}@%$#"
  private val Z85Decode: Array[Int] = {
    val t = Array.fill(128)(-1)
    Z85Alphabet.zipWithIndex.foreach { case (c, i) => t(c.toInt) = i }
    t
  }

  /** Z85 decode: 5 chars → 4 big-endian bytes. */
  def decodeZ85(s: String): Array[Byte] = {
    require(s.length % 5 == 0, s"z85 length not a multiple of 5: ${s.length}")
    val out = new Array[Byte](s.length / 5 * 4)
    var i = 0
    while (i < s.length) {
      var v = 0L
      var j = 0
      while (j < 5) {
        val c = s.charAt(i + j)
        val d = if (c < 128) Z85Decode(c.toInt) else -1
        require(d >= 0, s"invalid z85 character '$c'")
        v = v * 85 + d
        j += 1
      }
      val o = i / 5 * 4
      out(o) = ((v >>> 24) & 0xFF).toByte
      out(o + 1) = ((v >>> 16) & 0xFF).toByte
      out(o + 2) = ((v >>> 8) & 0xFF).toByte
      out(o + 3) = (v & 0xFF).toByte
      i += 5
    }
    out
  }

  private val MagicNumber = 1681511377

  /** Decode one standard 32-bit RoaringBitmap (portable format) from
    * `bb` (positioned at its cookie), returning the set values as
    * unsigned ints in a Long. */
  private def readRoaring32(bb: ByteBuffer): Seq[Long] = {
    val cookie = bb.getInt
    val hasRuns = (cookie & 0xFFFF) == 12347
    val n =
      if (hasRuns) (cookie >>> 16) + 1
      else {
        require(cookie == 12346,
          s"unrecognized roaring cookie $cookie (expected 12346/12347)")
        bb.getInt
      }
    val runFlags = new Array[Boolean](n)
    if (hasRuns) {
      val bytes = new Array[Byte]((n + 7) / 8)
      bb.get(bytes)
      var i = 0
      while (i < n) {
        runFlags(i) = ((bytes(i / 8) >> (i % 8)) & 1) == 1
        i += 1
      }
    }
    val keys = new Array[Int](n)
    val cards = new Array[Int](n)
    var i = 0
    while (i < n) {
      keys(i) = bb.getShort & 0xFFFF
      cards(i) = (bb.getShort & 0xFFFF) + 1
      i += 1
    }
    // offset header: present without runs, or with runs when n >= 4;
    // containers then follow in order — read sequentially, skip it
    if (!hasRuns || n >= 4) bb.position(bb.position() + 4 * n)
    val out = Seq.newBuilder[Long]
    i = 0
    while (i < n) {
      val hi = keys(i).toLong << 16
      if (runFlags(i)) {
        val numRuns = bb.getShort & 0xFFFF
        var r = 0
        while (r < numRuns) {
          val start = bb.getShort & 0xFFFF
          val len = bb.getShort & 0xFFFF // length - 1
          var v = start
          while (v <= start + len) { out += (hi | v); v += 1 }
          r += 1
        }
      } else if (cards(i) > 4096) {
        // bitmap container: 2^16 bits = 8 KiB, words little-endian
        var w = 0
        while (w < 1024) {
          val word = bb.getLong
          if (word != 0L) {
            var b = 0
            while (b < 64) {
              if (((word >>> b) & 1L) == 1L) out += (hi | (w * 64 + b))
              b += 1
            }
          }
          w += 1
        }
      } else {
        var c = 0
        while (c < cards(i)) {
          out += (hi | (bb.getShort & 0xFFFF))
          c += 1
        }
      }
      i += 1
    }
    out.result()
  }

  /** Decode a portable RoaringBitmapArray blob into 64-bit positions. */
  def decodeBitmapArray(data: Array[Byte]): Seq[Long] = {
    val bb = ByteBuffer.wrap(data).order(ByteOrder.LITTLE_ENDIAN)
    val magic = bb.getInt
    require(magic == MagicNumber,
      s"bad RoaringBitmapArray magic $magic (expected $MagicNumber)")
    val count = bb.getLong
    require(count >= 0 && count <= Int.MaxValue, s"bad bitmap count $count")
    (0L until count).flatMap { idx =>
      readRoaring32(bb).map(v => (idx << 32) | v)
    }
  }

  /** Resolve + decode one DV descriptor into deleted row indexes.
    * `tableDir` is the Delta table root (for `u` storage). */
  def positions(spark: SparkSession, tableDir: String, storageType: String,
      pathOrInlineDv: String, offset: Option[Int],
      sizeInBytes: Int): Seq[Long] = {
    storageType match {
      case "i" =>
        val data = decodeZ85(pathOrInlineDv)
        require(data.length >= sizeInBytes,
          s"inline DV shorter (${data.length}) than sizeInBytes $sizeInBytes")
        decodeBitmapArray(data.take(sizeInBytes))
      case "u" | "p" =>
        val p =
          if (storageType == "p") new Path(pathOrInlineDv)
          else {
            // u: optional random prefix + 20-char z85 UUID
            val prefix = pathOrInlineDv.dropRight(20)
            val uuidBytes = decodeZ85(pathOrInlineDv.takeRight(20))
            val bb = ByteBuffer.wrap(uuidBytes)
            val uuid = new UUID(bb.getLong, bb.getLong)
            val dirPart = if (prefix.isEmpty) "" else s"$prefix/"
            new Path(tableDir, s"${dirPart}deletion_vector_$uuid.bin")
          }
        val fsys: FileSystem =
          p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        val in = fsys.open(p)
        try {
          val off = offset.getOrElse(throw new IllegalArgumentException(
            s"DV descriptor for $p lacks the required offset"))
          in.seek(off.toLong)
          val lenBuf = new Array[Byte](4)
          in.readFully(lenBuf)
          val dataLen = ByteBuffer.wrap(lenBuf).getInt // big-endian
          require(dataLen == sizeInBytes,
            s"DV length prefix $dataLen != descriptor sizeInBytes $sizeInBytes ($p)")
          val data = new Array[Byte](dataLen)
          in.readFully(data)
          val crcBuf = new Array[Byte](4)
          in.readFully(crcBuf)
          val stored = ByteBuffer.wrap(crcBuf).getInt.toLong & 0xFFFFFFFFL
          val crc = new java.util.zip.CRC32
          crc.update(data)
          require(crc.getValue == stored,
            s"DV checksum mismatch for $p: stored $stored computed ${crc.getValue}")
          decodeBitmapArray(data)
        } finally in.close()
      case other =>
        throw new UnsupportedOperationException(
          s"unknown deletionVector storageType '$other'")
    }
  }
}
