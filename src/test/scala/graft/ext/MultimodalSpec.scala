package graft.ext

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.session
  import spark.implicits._

  val ids = Seq(0L, 1L, 2L, 3L).toDF("doc_id")

  test("synthesizeMedia: binary payload column with kind rotation") {
    val m = Multimodal.synthesizeMedia(ids, "doc_id").orderBy("media_id").collect()
    assert(m.map(_.getString(1)).toSeq == Seq("image", "audio", "video", "image"))
    assert(m.forall(_.getAs[Array[Byte]](2).length == 16)) // md5 payload
  }

  test("extractMeta: per-partition stub decode produces the declared schema") {
    val out = Multimodal.extractMeta(Multimodal.synthesizeMedia(ids, "doc_id"))
    assert(out.schema == Multimodal.mediaSchema)
    val rows = out.orderBy("media_id").collect()
    val img = rows(0).getStruct(3)
    assert(img.getInt(0) >= 16 && img.getInt(1) >= 16) // image w/h
    val aud = rows(1).getStruct(3)
    assert(aud.getInt(3) >= 8000)                      // audio sample rate
    // deterministic: same input -> same metadata
    val again = Multimodal.extractMeta(Multimodal.synthesizeMedia(ids, "doc_id"))
      .orderBy("media_id").collect()
    assert(rows.sameElements(again))
  }

  test("sampleFrames: stub splits payload into deterministic frame batches") {
    val frames = Multimodal.StubDecoder.sampleFrames(Array.tabulate(16)(_.toByte), everyN = 4)
    assert(frames.length == 4)
    assert(frames.forall(_.length == 4))
    assert(frames(1).toSeq == Seq[Byte](4, 5, 6, 7))
  }

  test("resizeAll: transform keeps one row per media, rewrites payload") {
    val media = Multimodal.synthesizeMedia(ids, "doc_id")
    val resized = Multimodal.resizeAll(media, 224, 224)
    assert(resized.count() == 4)
    val p = resized.orderBy("media_id").collect().head.getAs[Array[Byte]](1)
    assert(p.length == 10) // stub: 8-byte header + w + h
  }

  test("extractFeatures: deterministic unit-range embeddings feeding SimSearch") {
    val media = Multimodal.synthesizeMedia(ids, "doc_id")
    val feats = Multimodal.extractFeatures(media, dim = 8)
    val rows = feats.orderBy("media_id").collect()
    assert(rows.length == 4)
    val v0 = rows.head.getSeq[Double](1)
    assert(v0.length == 8 && v0.forall(x => x >= -1.0 && x <= 1.0))
    // deterministic across evaluations
    val v0b = Multimodal.extractFeatures(media, dim = 8)
      .orderBy("media_id").collect().head.getSeq[Double](1)
    assert(v0 == v0b)
    // composes with the similarity operator: every query gets k neighbors
    val topk = SimSearch.bruteForceTopK(feats, feats.filter($"media_id" < 2), k = 2,
      idCol = "media_id", vecCol = "embedding").collect()
    assert(topk.length == 4) // 2 queries x k=2
  }

  test("chunkAudio: overlapped windows cover the clip, truncated at the end") {
    val media = Multimodal.synthesizeMedia(ids, "doc_id")
    val chunks = Multimodal.chunkAudio(media, win = 6, hop = 4)
      .orderBy("media_id", "chunk_idx").collect()
    // 16-byte payload, hop 4 -> 4 windows per clip
    assert(chunks.length == 4 * 4)
    val first = chunks.filter(_.getLong(0) == 0L)
    assert(first.map(_.getInt(1)).toSeq == Seq(0, 1, 2, 3))
    assert(first.map(_.getInt(3)).toSeq == Seq(6, 6, 6, 4)) // last truncated
    // window i begins hop bytes into window i-1: suffix/prefix overlap
    val w0 = first(0).getAs[Array[Byte]](2)
    val w1 = first(1).getAs[Array[Byte]](2)
    assert(w0.drop(4).toSeq == w1.take(2).toSeq)
    // reassembling hop-strided prefixes reproduces the payload exactly
    val payload = media.filter($"media_id" === 0).collect().head.getAs[Array[Byte]](2)
    val rebuilt = first.flatMap(_.getAs[Array[Byte]](2).take(4))
    assert(rebuilt.toSeq == payload.toSeq)
  }
}
