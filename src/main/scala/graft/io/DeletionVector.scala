package graft.io

import java.nio.{ByteBuffer, ByteOrder}
import java.util.UUID

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/**
 * Delta Lake DELETION VECTOR codec (VERDICT r7 item 8): the
 * merge-on-read encoding Delta writers use for DELETE/UPDATE, per the
 * PUBLIC spec (delta-io/delta PROTOCOL.md, "Deletion Vectors" + the
 * RoaringBitmap interchange format, RoaringBitmap/RoaringFormatSpec).
 * The READ side lets the full-table read path apply foreign DVs
 * instead of refusing (the single most common foreign-Delta feature
 * the read guards trip on); the WRITE side lets [[DeltaLog.exportLog]]
 * emit a merge-on-read Manifest snapshot's delete state as real DV
 * files + descriptors — full MOR interop on the Delta face.
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
      sizeInBytes: Int): Seq[Long] =
    positionsConf(spark.sparkContext.hadoopConfiguration, tableDir,
      storageType, pathOrInlineDv, offset, sizeInBytes)

  /** [[positions]] against a plain Hadoop Configuration — the form an
    * EXECUTOR-side decode task calls (no SparkSession on executors):
    * [[DeltaLog.readVersion]] ships the descriptors as a frame and
    * decodes each DV inside a task, so a DV-heavy foreign table
    * (hundreds of millions of deleted rows) never expands into
    * driver-side position tuples. */
  def positionsConf(conf: org.apache.hadoop.conf.Configuration,
      tableDir: String, storageType: String,
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
        val fsys: FileSystem = p.getFileSystem(conf)
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

  /** Read an ICEBERG-V3 deletion vector out of a Puffin file
    * (`deletion-vector-v1` blob, located by the manifest entry's
    * `content_offset`/`content_size_in_bytes`): at the offset sits a
    * 4-byte big-endian length L of (magic + vector), then the magic
    * bytes D1 D3 39 64 — which read little-endian ARE Delta's
    * RoaringBitmapArray magic (v3 adopted Delta's exact serialization
    * so the two formats can share DV files) — the vector, and a
    * 4-byte big-endian CRC-32 over those L bytes. `blobSize` is the
    * entry's `content_size_in_bytes` (= L + 8 for prefix + CRC),
    * verified; pass a negative value to skip that cross-check. The
    * whole read is one seek + L+12 bytes — never the file. */
  def positionsPuffin(conf: org.apache.hadoop.conf.Configuration,
      puffinPath: String, offset: Long, blobSize: Long): Seq[Long] = {
    val p = new Path(puffinPath)
    val fsys: FileSystem = p.getFileSystem(conf)
    val in = fsys.open(p)
    try {
      in.seek(offset)
      val lenBuf = new Array[Byte](4)
      in.readFully(lenBuf)
      val dataLen = ByteBuffer.wrap(lenBuf).getInt // big-endian
      require(dataLen > 0, s"bad puffin DV length prefix $dataLen ($puffinPath)")
      require(blobSize < 0 || blobSize == dataLen + 8L,
        s"puffin DV blob size $blobSize != length prefix $dataLen + 8 " +
          s"($puffinPath @ $offset)")
      val data = new Array[Byte](dataLen)
      in.readFully(data)
      val crcBuf = new Array[Byte](4)
      in.readFully(crcBuf)
      val stored = ByteBuffer.wrap(crcBuf).getInt.toLong & 0xFFFFFFFFL
      val crc = new java.util.zip.CRC32
      crc.update(data)
      require(crc.getValue == stored,
        s"puffin DV checksum mismatch for $puffinPath @ $offset: " +
          s"stored $stored computed ${crc.getValue}")
      decodeBitmapArray(data)
    } finally in.close()
  }

  // ---- WRITER side (round 8 wave 2): encode + store ---------------------
  // the export face needs to EMIT deletion vectors, not just read them:
  // a merge-on-read Manifest snapshot exports its delete state as real
  // DV files + descriptors instead of refusing the Delta face.

  /** Z85 encode (input padded to a 4-byte multiple; callers carry the
    * true length separately, exactly like the descriptor's
    * `sizeInBytes`). */
  def encodeZ85(bytes: Array[Byte]): String = {
    val padded = bytes ++ Array.fill((4 - bytes.length % 4) % 4)(0.toByte)
    val sb = new StringBuilder(padded.length / 4 * 5)
    var i = 0
    while (i < padded.length) {
      var v = 0L
      var j = 0
      while (j < 4) { v = (v << 8) | (padded(i + j) & 0xFF); j += 1 }
      var div = 85L * 85 * 85 * 85
      while (div > 0) {
        sb.append(Z85Alphabet(((v / div) % 85).toInt))
        div /= 85
      }
      i += 4
    }
    sb.toString
  }

  /** Serialize sorted 64-bit positions as a portable RoaringBitmapArray
    * blob (array containers ≤4096 values, bitmap containers above —
    * runs never emitted; cookie 12346). Inverse of
    * [[decodeBitmapArray]], round-trip-proven in spec. */
  def encodeBitmapArray(positions: Seq[Long]): Array[Byte] = {
    require(positions.nonEmpty, "empty deletion vector")
    val sorted = positions.distinct.sorted
    val byBitmap = sorted.groupBy(_ >>> 32).toSeq.sortBy(_._1)
    require(byBitmap.last._1 < Int.MaxValue, "position out of range")
    val bitmapCount = byBitmap.last._1 + 1 // dense index order
    val out = new java.io.ByteArrayOutputStream()
    def putLE(n: Int): Unit = {
      out.write(n & 0xFF); out.write((n >>> 8) & 0xFF)
      out.write((n >>> 16) & 0xFF); out.write((n >>> 24) & 0xFF)
    }
    def putLE16(n: Int): Unit = { out.write(n & 0xFF); out.write((n >>> 8) & 0xFF) }
    putLE(MagicNumber)
    putLE(bitmapCount.toInt); putLE((bitmapCount >>> 32).toInt) // LE int64
    val byIdx = byBitmap.toMap
    (0L until bitmapCount).foreach { idx =>
      val vals = byIdx.getOrElse(idx, Nil).map(v => (v & 0xFFFFFFFFL).toInt)
      val containers = vals.groupBy(v => v >>> 16).toSeq.sortBy(_._1)
      putLE(12346) // cookie: no run containers
      putLE(containers.size)
      containers.foreach { case (key, vs) =>
        putLE16(key); putLE16(vs.size - 1)
      }
      // offset header: byte offsets of each container from the start of
      // THIS bitmap's serialization
      var off = 4 + 4 + 4 * containers.size + 4 * containers.size
      containers.foreach { case (_, vs) =>
        putLE(off)
        off += (if (vs.size > 4096) 8192 else 2 * vs.size)
      }
      containers.foreach { case (_, vs) =>
        if (vs.size > 4096) {
          val words = new Array[Long](1024)
          vs.foreach { v =>
            val low = v & 0xFFFF
            words(low / 64) |= (1L << (low % 64))
          }
          words.foreach { w =>
            var k = 0
            while (k < 8) { out.write(((w >>> (8 * k)) & 0xFF).toInt); k += 1 }
          }
        } else vs.sorted.foreach(v => putLE16(v & 0xFFFF))
      }
    }
    out.toByteArray
  }

  /** Result of [[writeDvFile]]: the descriptor fields an `add` action
    * carries. */
  final case class DvDescriptor(pathOrInlineDv: String, offset: Int,
      sizeInBytes: Int, cardinality: Long) {
    def json: String =
      s"""{"storageType":"u","pathOrInlineDv":"$pathOrInlineDv",""" +
        s""""offset":$offset,"sizeInBytes":$sizeInBytes,""" +
        s""""cardinality":$cardinality}"""
  }

  /** Write (idempotently) a DV FILE for `positions` under the table
    * root, per the spec's framing (version byte, big-endian length,
    * data, big-endian CRC-32). The file name's UUID derives from the
    * CONTENT, so a re-export writes the same bytes to the same key —
    * immutable, incremental, and shareable between files with equal
    * delete sets. */
  def writeDvFile(spark: SparkSession, tableDir: String,
      positions: Seq[Long]): DvDescriptor =
    writeDvFileConf(spark.sparkContext.hadoopConfiguration, tableDir, positions)

  /** [[writeDvFile]] against a plain Hadoop Configuration — callable
    * from an executor task, so the export encodes each file's delete
    * set where its positions already live instead of hauling every
    * deleted row index to the driver. Idempotency is unchanged: the
    * content-addressed name makes concurrent/repeated writes converge
    * on identical bytes at the same key. */
  def writeDvFileConf(conf: org.apache.hadoop.conf.Configuration,
      tableDir: String, positions: Seq[Long]): DvDescriptor = {
    val data = encodeBitmapArray(positions)
    val uuid = UUID.nameUUIDFromBytes("graft-dv:".getBytes("UTF-8") ++ data)
    val base = new Path(tableDir)
    val fsys = base.getFileSystem(conf)
    val dest = new Path(base, s"deletion_vector_$uuid.bin")
    if (!fsys.exists(dest)) {
      val crc = new java.util.zip.CRC32; crc.update(data)
      val bb = ByteBuffer.allocate(1 + 4 + data.length + 4)
      bb.put(1.toByte)
      bb.putInt(data.length) // big-endian
      bb.put(data)
      bb.putInt(crc.getValue.toInt) // big-endian
      val tmp = new Path(base, s".deletion_vector_$uuid.bin.tmp")
      val out = fsys.create(tmp, true)
      try out.write(bb.array()) finally out.close()
      if (!fsys.rename(tmp, dest)) {
        fsys.delete(tmp, false)
        if (!fsys.exists(dest))
          throw new RuntimeException(s"DV write failed for $dest")
      }
    }
    val uuidBytes = ByteBuffer.allocate(16)
      .putLong(uuid.getMostSignificantBits)
      .putLong(uuid.getLeastSignificantBits).array()
    DvDescriptor(encodeZ85(uuidBytes), 1, data.length,
      positions.distinct.size.toLong)
  }
}
