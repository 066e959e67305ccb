package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def media = Seq(
    (1L, "abcdefgh".getBytes("UTF-8"), "image"),
    (2L, ("x" * 300).getBytes("UTF-8"), "video"),
    (3L, Array.empty[Byte], "audio")
  ).toDF("media_id", "content", "kind")

  test("featurize: per-partition decoder, normalized histogram features") {
    val out = Multimodal.featurize(media, "media_id", "content", dim = 8)
    assert(out.columns.toSeq === Seq("media_id", "features"))
    val f1 = out.filter(col("media_id") === 1).select("features")
      .as[Array[Float]].head()
    assert(f1.length === 8)
    assert(math.abs(f1.sum - 1.0f) < 1e-5, "L1-normalized")
    val f3 = out.filter(col("media_id") === 3).select("features")
      .as[Array[Float]].head()
    assert(f3.forall(_ === 0.0f), "empty payload → zero vector")
  }

  test("sampleFrames: fixed-size frames, everyN stride, binary pruned") {
    val out = Multimodal.sampleFrames(media, "media_id", "content",
      frameSize = 100, everyN = 2)
    val m2 = out.filter(col("media_id") === 2)
      .select("frame_idx", "frame").as[(Int, Array[Byte])].collect()
      .sortBy(_._1)
    // 300 bytes / 100 = 3 frames → stride 2 keeps frames 0 and 2
    assert(m2.map(_._1).toSeq === Seq(0, 2))
    assert(m2.head._2.length === 100)
    assert(out.filter(col("media_id") === 3).count() === 0, "empty → no frames")
  }

  test("withDecodedMeta: stub decode per kind") {
    val out = Multimodal.withDecodedMeta(media, "media_id", "content", "kind")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getInt(2) === 9 /* (8 % 640) + 1 */)
    assert(out(3L).getInt(5) === 16000, "audio sample rate")
    assert(out(2L).getLong(4) === 1200L, "video duration from stub")
  }

  test("resized keeps every factor-th byte; empty payload stays empty") {
    val out = Multimodal.resized(media, "media_id", "content", factor = 3)
      .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    assert(new String(out(1L), "UTF-8") === "adg", "bytes 0, 3, 6 of abcdefgh")
    assert(out(2L).length === 100, "ceil(300 / 3)")
    assert(out(3L).isEmpty)
  }

  test("ImageCodec: real PNG roundtrip reports actual dimensions") {
    val codec = new Multimodal.ImageCodec
    val png = Multimodal.pngBytes(37, 23, seed = 42L)
    assert(codec.dims(png) === Some((37, 23)))
    assert(codec.dims("not an image".getBytes("UTF-8")) === None)
    assert(codec.dims(Array.empty[Byte]) === None)
  }

  test("ImageCodec.resize halves dimensions with floor 1") {
    val codec = new Multimodal.ImageCodec
    val resized = codec.resize(Multimodal.pngBytes(9, 5, 1L), factor = 2).get
    assert(codec.dims(resized) === Some((4, 2)))
    val tiny = codec.resize(Multimodal.pngBytes(1, 1, 1L), factor = 4).get
    assert(codec.dims(tiny) === Some((1, 1)), "never shrinks below 1x1")
    assert(codec.resize("text".getBytes("UTF-8"), 2) === None)
  }

  test("withDecodedMeta: real codec for decodable images, stub fallback") {
    val mixed = Seq(
      (1L, Multimodal.pngBytes(12, 34, 7L), "image"),   // real decode
      (2L, "abcdefgh".getBytes("UTF-8"), "image"),      // stub fallback
      (3L, "abcdefgh".getBytes("UTF-8"), "audio")       // stub by kind
    ).toDF("media_id", "content", "kind")
    val out = Multimodal.withDecodedMeta(mixed, "media_id", "content", "kind")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getInt(2) === 12 && out(1L).getInt(3) === 34)
    assert(out(2L).getInt(2) === 9, "(8 % 640) + 1 stub arithmetic")
    assert(out(3L).getInt(5) === 16000)
  }

  test("resizedImage: real resize for images, stub byte-drop fallback") {
    val mixed = Seq(
      (1L, Multimodal.pngBytes(20, 10, 7L)),
      (2L, "abcdefgh".getBytes("UTF-8"))
    ).toDF("media_id", "content")
    val out = Multimodal.resizedImage(mixed, "media_id", "content", factor = 2)
      .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    val codec = new Multimodal.ImageCodec
    assert(codec.dims(out(1L)) === Some((10, 5)))
    assert(new String(out(2L), "UTF-8") === "aceg", "stub keeps every 2nd byte")
  }

  test("dHash: identical pixels hash equal, different pixels differ, " +
      "undecodable hashes null") {
    val imgs = Seq(
      (1L, Multimodal.pngBytes(24, 18, 9L)),
      (2L, Multimodal.pngBytes(24, 18, 9L)),  // same seed+dims = same image
      (3L, Multimodal.pngBytes(24, 18, 10L)), // different pixels
      (4L, "not an image".getBytes("UTF-8"))
    ).toDF("media_id", "content")
    val out = Multimodal.dHash(imgs, "media_id", "content")
      .collect().map(r =>
        r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toMap
    assert(out(1L).isDefined && out(1L) === out(2L))
    assert(out(1L) !== out(3L), "independent pixel streams should differ")
    assert(out(4L) === None)
  }

  test("dHash + signatureNearDupPairs pair the perceptual duplicates") {
    val imgs = Seq(
      (1L, Multimodal.pngBytes(20, 16, 3L)),
      (2L, Multimodal.pngBytes(20, 16, 3L)),
      (3L, Multimodal.pngBytes(20, 16, 4L)),
      (4L, "junk".getBytes("UTF-8"))
    ).toDF("media_id", "content")
    val hashes = Multimodal.dHash(imgs, "media_id", "content")
    val pairs = Dedup.signatureNearDupPairs(hashes, "media_id", "dhash",
        maxDist = 0)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs === Set((1L, 2L)))
  }

  test("multimodal features feed Similarity directly") {
    val feats = Multimodal.featurize(media, "media_id", "content", dim = 8)
    val top = Similarity.bruteForceTopK(feats, feats.filter(col("media_id") === 1),
      "media_id", "features", k = 2)
    assert(top.count() === 2)
  }
}
