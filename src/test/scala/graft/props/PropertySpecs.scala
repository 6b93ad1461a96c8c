package graft.props

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

import graft.SparkTestBase
import graft.meta.{ColumnMeta, TableMeta}
import graft.validate.Gates

/** Property-based coverage committed in SURVEY §5.2: gates on generated
  * schemas, engine Jaccard vs a scalar reference implementation, MinHash
  * soundness. Pure ScalaCheck Properties (run natively by sbt). */
object GateProps extends Properties("gates") {

  val nameGen: Gen[String] = Gen.choose(1, 8).flatMap(n =>
    Gen.listOfN(n, Gen.alphaLowerChar).map(_.mkString))

  property("columnSetGate passes iff sets equal; errors = symmetric diff") =
    forAll(Gen.listOf(nameGen), Gen.listOf(nameGen)) { (observed, declared) =>
      val meta = TableMeta("t", "json", declared.distinct.map(ColumnMeta(_, "character")))
      val r = Gates.columnSetGate(observed.distinct, meta)
      val symDiff = (observed.toSet diff declared.toSet) ++ (declared.toSet diff observed.toSet)
      (r.passed == symDiff.isEmpty) && (r.errors.size == symDiff.size)
    }

  property("rowCountGate passes iff count >= min") =
    forAll(Gen.choose(0L, 1000L), Gen.choose(0L, 1000L)) { (count, min) =>
      Gates.rowCountGate(count, min).passed == (count >= min)
    }
}

object DedupProps extends Properties("dedup") {

  // each trial runs Spark jobs — a handful of generated corpora suffices
  override def overrideParameters(p: org.scalacheck.Test.Parameters): org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(5)

  // scalar reference Jaccard over word-3-gram sets, mirroring Dedup.shingles
  private def shingleSet(text: String): Set[String] = {
    val toks = text.toLowerCase.split(" ", -1)
    if (toks.length < 3) Set.empty
    else (0 to toks.length - 3).map(i => s"${toks(i)} ${toks(i + 1)} ${toks(i + 2)}").toSet
  }
  private def refJaccard(a: String, b: String): Double = {
    val (sa, sb) = (shingleSet(a), shingleSet(b))
    val union = (sa ++ sb).size
    if (union == 0) 0.0 else (sa & sb).size.toDouble / union
  }

  val wordGen: Gen[String] = Gen.oneOf("alpha", "beta", "gamma", "delta", "epsilon", "zeta")
  val textGen: Gen[String] = Gen.choose(3, 20).flatMap(n =>
    Gen.listOfN(n, wordGen).map(_.mkString(" ")))

  property("engine Jaccard equals the scalar reference") = {
    val spark = SparkTestBase.session
    import spark.implicits._
    forAll(Gen.listOfN(5, textGen)) { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val engine = graft.ext.Dedup.jaccardPairs(docs, "doc_id", "text", 3, 0.0)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      val checks = for (i <- texts.indices; j <- texts.indices if i < j) yield {
        val e = refJaccard(texts(i), texts(j))
        if (e > 0) engine.get((i.toLong, j.toLong)).exists(g => math.abs(g - e) < 1e-12)
        else !engine.contains((i.toLong, j.toLong)) // no shared shingle -> no pair emitted
      }
      checks.forall(identity)
    }
  }

  property("MinHash verified pairs equal exact pairs at threshold 0.9") = {
    val spark = SparkTestBase.session
    import spark.implicits._
    forAll(Gen.listOfN(4, textGen)) { texts =>
      val all = texts :+ texts.head // plant one exact duplicate
      val docs = all.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val exact = graft.ext.Dedup.jaccardPairs(docs, "doc_id", "text", 3, 0.9)
        .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val mh = graft.ext.Dedup.minhashNearDupPairs(docs, "doc_id", "text", threshold = 0.9)
        .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      mh == exact
    }
  }

  // driver-side union-find as the reference for the distributed propagation
  private def refComponents(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  val edgeGen: Gen[(Long, Long)] = for {
    a <- Gen.choose(0L, 15L); b <- Gen.choose(0L, 15L) if a != b
  } yield (math.min(a, b), math.max(a, b))

  property("clusterAssignments equals driver-side union-find on random graphs") = {
    val spark = SparkTestBase.session
    import spark.implicits._
    forAll(Gen.choose(1, 12).flatMap(n => Gen.listOfN(n, edgeGen))) { edges =>
      val pairs = edges.toDF("d1", "d2")
      val engine = graft.ext.Dedup.clusterAssignments(pairs)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      engine == refComponents(edges)
    }
  }
}

object AsofProps extends Properties("asof") {

  override def overrideParameters(p: org.scalacheck.Test.Parameters): org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(5)

  // distinct right timestamps per key keep the scalar reference unambiguous
  val rowsGen: Gen[(List[(Long, Long)], List[(Long, Long, Long)])] = for {
    nl <- Gen.choose(1, 8)
    nr <- Gen.choose(0, 8)
    left <- Gen.listOfN(nl, Gen.zip(Gen.choose(0L, 2L), Gen.choose(0L, 50L)))
    rightTs <- Gen.listOfN(nr, Gen.zip(Gen.choose(0L, 2L), Gen.choose(0L, 50L)))
  } yield (left, rightTs.distinct.zipWithIndex.map { case ((k, t), i) => (k, t, i.toLong * 10) })

  property("asofJoinBackward/Forward equal the scalar reference") = {
    val spark = SparkTestBase.session
    import spark.implicits._
    forAll(rowsGen) { case (left, right) =>
      // dedupe right on (key, ts): the scalar reference needs one payload
      // per instant; the engine resolves real ties deterministically anyway
      val rightU = right.groupBy(r => (r._1, r._2)).map(_._2.maxBy(_._3)).toList
      val l = left.zipWithIndex.map { case ((k, t), i) => (i.toLong, k, t) }
        .toDF("lid", "k", "lts")
      val r = rightU.toDF("k", "rts", "pay")
      val back = graft.ops.TimeOps.asofJoinBackward(l, r, "k", "lts", "rts", Seq("pay"))
        .collect().map(x => x.getLong(0) -> (if (x.isNullAt(3)) None else Some(x.getLong(3)))).toMap
      val fwd = graft.ops.TimeOps.asofJoinForward(l, r, "k", "lts", "rts", Seq("pay"))
        .collect().map(x => x.getLong(0) -> (if (x.isNullAt(3)) None else Some(x.getLong(3)))).toMap
      left.zipWithIndex.forall { case ((k, t), i) =>
        val refBack = rightU.filter(x => x._1 == k && x._2 <= t)
          .sortBy(_._2).lastOption.map(_._3)
        val refFwd = rightU.filter(x => x._1 == k && x._2 >= t)
          .sortBy(_._2).headOption.map(_._3)
        back(i.toLong) == refBack && fwd(i.toLong) == refFwd
      }
    }
  }
}

object MaintenanceProps extends Properties("maintenance") {

  override def overrideParameters(p: org.scalacheck.Test.Parameters): org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(5)

  val kvGen: Gen[List[(Int, Int)]] = Gen.choose(0, 12).flatMap(n =>
    Gen.listOfN(n, Gen.zip(Gen.choose(0, 6), Gen.choose(-100, 100))))

  property("upsert is idempotent and matches the scalar map-update reference") = {
    val spark = SparkTestBase.session
    import spark.implicits._
    forAll(kvGen, kvGen) { (target0, updates0) =>
      // key-unique sides (the operator's documented contract)
      val target = target0.groupBy(_._1).map(_._2.head).toList
      val updates = updates0.groupBy(_._1).map(_._2.head).toList
      val t = target.toDF("k", "v")
      val u = updates.toDF("k", "v")
      val once = graft.ops.Merge.upsert(t, u, "k")
      val got = once.collect().map(r => r.getInt(0) -> r.getInt(1)).toMap
      val ref = target.toMap ++ updates.toMap
      val twice = graft.ops.Merge.upsert(once, u, "k")
        .collect().map(r => r.getInt(0) -> r.getInt(1)).toMap
      got == ref && twice == ref
    }
  }

  property("ewma lies within [min, max] of its series and matches a scalar fold") = {
    val spark = SparkTestBase.session
    import spark.implicits._
    forAll(Gen.choose(1, 10).flatMap(n =>
      Gen.listOfN(n, Gen.choose(-50.0, 50.0)))) { vals =>
      val rows = vals.zipWithIndex.map { case (v, i) => (1, i.toLong, i.toLong, v) }
      val df = rows.toDF("k", "eid", "ts", "v")
      val got = graft.ops.TimeOps.ewma(df, "k", "ts", "v", 0.25, "eid")
        .collect().head.getDouble(2)
      val ref = vals.tail.foldLeft(vals.head)((acc, x) => 0.25 * x + 0.75 * acc)
      val rounded = BigDecimal(ref).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
      math.abs(got - rounded) < 1e-9 &&
        got >= vals.min - 1e-9 && got <= vals.max + 1e-9
    }
  }

  property("morton key round-trips: de-interleaving recovers both inputs") =
    forAll(Gen.choose(0L, 65535L), Gen.choose(0L, 65535L)) { (a, b) =>
      val z = (0 until 16).foldLeft(0L) { (acc, j) =>
        acc | (((a >> j) & 1L) << (2 * j)) | (((b >> j) & 1L) << (2 * j + 1))
      }
      val backA = (0 until 16).foldLeft(0L)((acc, j) => acc | (((z >> (2 * j)) & 1L) << j))
      val backB = (0 until 16).foldLeft(0L)((acc, j) => acc | (((z >> (2 * j + 1)) & 1L) << j))
      backA == a && backB == b
    }
}

/** Codec round-trip laws on arbitrary rasters/samples — the properties
  * that make the REAL media decode trustworthy beyond the fixed specs:
  * any (w, h, rgb) survives P6 encode→decode, any frame list survives
  * concat→demux, any PCM clip survives WAV encode→decode, and NN resize
  * hits exactly the ⌊·⌋ source-index mapping. */
object MediaCodecProps extends Properties("mediacodec") {
  import graft.ext.MediaCodec

  private val dimGen = Gen.choose(1, 24)
  private def rgbGen(w: Int, h: Int): Gen[Array[Byte]] =
    Gen.containerOfN[Array, Byte](w * h * 3, Gen.choose(-128, 127).map(_.toByte))

  property("P6 encode/decode is identity") =
    forAll(dimGen, dimGen) { (w, h) =>
      forAll(rgbGen(w, h)) { rgb =>
        val (dw, dh, drgb) = MediaCodec.decodePpm(MediaCodec.encodePpm(w, h, rgb))
        dw == w && dh == h && drgb.sameElements(rgb)
      }
    }

  property("concatenated-P6 demux recovers every frame in order") =
    forAll(Gen.choose(1, 5), dimGen, dimGen) { (k, w, h) =>
      forAll(Gen.listOfN(k, rgbGen(w, h))) { frames =>
        val stream = frames.map(MediaCodec.encodePpm(w, h, _)).reduce(_ ++ _)
        val out = MediaCodec.decodePpmFrames(stream)
        out.size == k && out.zip(frames).forall { case ((dw, dh, rgb), exp) =>
          dw == w && dh == h && rgb.sameElements(exp)
        }
      }
    }

  property("WAV encode/decode is identity (rate and samples)") =
    forAll(Gen.choose(8000, 48000), Gen.nonEmptyListOf(Gen.choose(Short.MinValue, Short.MaxValue))) {
      (rate, samples) =>
        val (dr, ds) = MediaCodec.decodeWav(MediaCodec.encodeWav(rate, samples.map(_.toShort).toArray))
        dr == rate && ds.sameElements(samples.map(_.toShort))
    }

  property("adversarial bytes: decoders throw cleanly, never hang or return garbage") =
    forAll(Gen.oneOf(
      // pure noise
      Gen.nonEmptyListOf(Gen.choose(Byte.MinValue, Byte.MaxValue)).map(_.toArray),
      // valid WAV prefix, truncated at a random point
      Gen.choose(8000, 16000).flatMap { rate =>
        Gen.choose(1, 32).flatMap { n =>
          val wav = MediaCodec.encodeWav(rate, Array.tabulate(n)(i => (i * 321).toShort))
          Gen.choose(1, wav.length - 1).map(wav.take)
        }
      },
      // valid PPM with a flipped header byte
      Gen.choose(1, 8).flatMap { w =>
        val ppm = MediaCodec.encodePpm(w, 2, Array.fill(w * 2 * 3)(7.toByte))
        Gen.choose(0, math.min(12, ppm.length - 1)).map { i =>
          val c = ppm.clone(); c(i) = (c(i) ^ 0x35).toByte; c
        }
      })) { bytes =>
      def safelyRejectsOrParses(f: => Any): Boolean =
        try { f; true }
        catch {
          case _: IllegalArgumentException => true
          case _: java.nio.BufferUnderflowException => true
          case _: NumberFormatException => true
          case _: ArrayIndexOutOfBoundsException => false // silent OOB = bug
          case _: OutOfMemoryError => false
        }
      safelyRejectsOrParses(MediaCodec.decodeWav(bytes)) &&
        safelyRejectsOrParses(MediaCodec.decodePpm(bytes)) &&
        safelyRejectsOrParses(MediaCodec.decodePpmFrames(bytes).toArray)
    }

  property("NN resize output pixel (y,x) equals source pixel (⌊y·h/oh⌋, ⌊x·w/ow⌋)") =
    forAll(dimGen, dimGen, dimGen, dimGen) { (w, h, ow, oh) =>
      forAll(rgbGen(w, h)) { rgb =>
        val out = MediaCodec.resizeNearest(w, h, rgb, ow, oh)
        out.length == ow * oh * 3 &&
          (0 until oh).forall { y =>
            (0 until ow).forall { x =>
              val si = ((y * h / oh) * w + (x * w / ow)) * 3
              val di = (y * ow + x) * 3
              (0 until 3).forall(c => out(di + c) == rgb(si + c))
            }
          }
      }
    }
}

object BloomProps extends Properties("bloom") {

  // each trial runs Spark jobs — a handful of generated sets suffices
  override def overrideParameters(p: org.scalacheck.Test.Parameters): org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(5)

  /** Scalar reference of [[graft.ops.Bloom.position]]: md5 hex of
    * "i:key", first 15 hex digits as a long, mod m. */
  private def refPosition(key: Long, i: Int, m: Int): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$i:$key".getBytes("UTF-8"))
    val hex = d.map("%02x".format(_)).mkString.take(15)
    java.lang.Long.parseLong(hex, 16) % m
  }

  private val keysGen = Gen.nonEmptyListOf(Gen.choose(0L, 1000000L)).map(_.distinct)

  property("no false negatives: every built key passes its own filter") =
    forAll(keysGen) { keys =>
      val spark = SparkTestBase.session
      import spark.implicits._
      import org.apache.spark.sql.functions.col
      val df = keys.toDF("key")
      val bits = graft.ops.Bloom.buildBits(df, "key", m = 512, k = 3)
      graft.ops.Bloom.probe(df, "key", bits, m = 512, k = 3)
        .filter(!col("bloom_pass")).count() == 0L
    }

  property("engine probe decision equals the scalar md5 reference") =
    forAll(keysGen, keysGen) { (members, probes) =>
      val spark = SparkTestBase.session
      import spark.implicits._
      import org.apache.spark.sql.functions.col
      val m = 512; val k = 3
      val bitSet = members.flatMap(key => (0 until k).map(refPosition(key, _, m))).toSet
      val bits = graft.ops.Bloom.buildBits(members.toDF("key"), "key", m, k)
      val engine = graft.ops.Bloom.probe(probes.toDF("key"), "key", bits, m, k)
        .select(col("key"), col("bloom_pass"))
        .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
      probes.forall { p =>
        engine(p) == (0 until k).forall(i => bitSet.contains(refPosition(p, i, m)))
      }
    }
}
