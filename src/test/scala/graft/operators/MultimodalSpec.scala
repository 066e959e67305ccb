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

  test("AudioCodec: real WAV roundtrip — header fields, exact 16-bit " +
      "samples, multi-channel integer averaging, 8-bit path") {
    val codec = new Multimodal.AudioCodec
    val s16 = Array[Short](0, 16384, -32768, 32767, -1, 100)
    val wav = Multimodal.wavBytes(16000, 1, s16)
    val m = codec.meta(wav).get
    assert((m.channels, m.sampleRate, m.bitsPerSample, m.nFrames) ===
      ((1, 16000, 16, 6L)))
    assert(m.durationMs === 6L * 1000 / 16000)
    val dec = codec.samples(wav).get
    assert(dec === s16.map(_ / 32768.0f), "16-bit decode is exact")
    // stereo: frames average integer-exactly before the division
    val st = Multimodal.wavBytes(8000, 2, Array[Short](100, 200, -7, -8))
    assert(codec.meta(st).get.nFrames === 2L)
    assert(codec.samples(st).get ===
      Array(150 / 32768.0f, (-15 / 2) / 32768.0f))
    // a LIST chunk before fmt/data is skipped (chunk-walking parse)
    val bare = Multimodal.wavBytes(8000, 1, Array[Short](5, 6))
    val extra = java.nio.ByteBuffer.allocate(bare.length + 12)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    extra.put(bare, 0, 12)
    extra.put("LIST".getBytes("US-ASCII")).putInt(4).putInt(0)
    extra.put(bare, 12, bare.length - 12)
    val withList = extra.array()
    // patch the RIFF size for the inserted chunk
    val riffSz = java.nio.ByteBuffer.wrap(withList, 4, 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    riffSz.putInt(withList.length - 8)
    assert(codec.samples(withList).get ===
      Array(5 / 32768.0f, 6 / 32768.0f))
    // non-WAV / truncated / compressed-format payloads decode to None
    assert(codec.meta("not audio at all".getBytes).isEmpty)
    assert(codec.meta(bare.take(20)).isEmpty)
    val mp3ish = bare.clone(); mp3ish(20) = 85 // audioFormat != 1
    assert(codec.meta(mp3ish).isEmpty)
    // a crafted chunk size near Int.MaxValue must not wrap the bounds
    // arithmetic — the never-throw contract for crawled media (the
    // parse returns None; samples/envelope follow)
    val crafted = bare.clone()
    java.nio.ByteBuffer.wrap(crafted, 16, 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(Int.MaxValue - 4) // fmt chunk size: off+8+sz wraps in Int
    assert(codec.meta(crafted).isEmpty)
    assert(codec.samples(crafted).isEmpty)
    assert(codec.energyEnvelope(crafted, 4).isEmpty)
    val crafted2 = bare.clone() // data chunk size just as hostile
    java.nio.ByteBuffer.wrap(crafted2, 40, 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(Int.MaxValue - 40)
    assert(codec.meta(crafted2).isEmpty)
  }

  test("AudioCodec.energyEnvelope: exact window sums, silence is zero") {
    val codec = new Multimodal.AudioCodec
    // 4 samples, 2 windows: |2048|+|−2048| vs |4096|+|0|
    val wav = Multimodal.wavBytes(8000, 1,
      Array[Short](2048, -2048, 4096, 0))
    val env = codec.energyEnvelope(wav, 2).get
    assert(env === Array(0.5f, 0.5f))
    val loud = Multimodal.wavBytes(8000, 1, Array[Short](1024, 3072))
    assert(codec.energyEnvelope(loud, 2).get === Array(0.25f, 0.75f))
    val silence = Multimodal.wavBytes(8000, 1, Array[Short](0, 0, 0))
    assert(codec.energyEnvelope(silence, 4).get === Array(0f, 0f, 0f, 0f))
  }

  test("audioFeatures + withDecodedMeta: real codec for WAV rows, stub " +
      "fallback for the rest; video seam routes to a plugged codec") {
    import spark.implicits._
    val wavs = Multimodal.synthWavs(
      Seq((1L, 8000, 40), (2L, 16000, 80)).toDF("id", "sr", "n"),
      "id", "sr", "n")
    val mixed = wavs.withColumn("kind", lit("audio"))
      .unionByName(Seq((3L, "plain text, not a wav", "audio"))
        .toDF("media_id", "content", "kind")
        .withColumn("content", col("content").cast("binary")))
    val meta = Multimodal.withDecodedMeta(mixed, "media_id", "content",
        "kind").collect().map(r => r.getLong(0) -> r).toMap
    assert(meta(1L).getLong(4) === 40L * 1000 / 8000)
    assert(meta(1L).getInt(5) === 8000)
    assert(meta(2L).getInt(5) === 16000)
    assert(meta(3L).getInt(5) === 16000, "non-WAV falls back to the stub")
    assert(meta(3L).getLong(4) === "plain text, not a wav".length * 8L)
    // the envelope is the real one: replay sample stream for id 1
    val env = Multimodal.audioFeatures(wavs, "media_id", "content", dim = 4)
      .filter(col("media_id") === 1).select("features")
      .as[Array[Float]].head()
    val samples = Array.tabulate(40)(i =>
      ((2L * (i + 7)) % 65536 - 32768) / 32768.0)
    val sums = Array.tabulate(4)(k =>
      (k * 40 / 4 until (k + 1) * 40 / 4).map(i => math.abs(samples(i))).sum)
    val expected = sums.map(v => (v / sums.sum).toFloat)
    assert(env === expected, "envelope must replay from the raw stream")
    // video plugin seam: a caller-supplied codec wins over the stub
    val vid = Seq((9L, Array[Byte](1, 2, 3), "video"))
      .toDF("media_id", "content", "kind")
    val plugged = Multimodal.withDecodedMeta(vid, "media_id", "content",
      "kind", videoCodec = Some(new Multimodal.VideoCodec {
        def meta(bytes: Array[Byte]) = Some((640, 480, 1234L))
      })).head()
    assert((plugged.getInt(2), plugged.getInt(3), plugged.getLong(4)) ===
      ((640, 480, 1234L)))
  }

  test("VideoCodec seam contract: serializable config + lazy handle " +
      "acquired once per partition, parse-failure stub fallback, mixed " +
      "tables intact — a production codec is a drop-in") {
    import spark.implicits._
    MultimodalSpec.FakeVideoCodec.reset()
    // 8 parseable payloads (first three bytes encode w/h/duration) plus
    // one the codec refuses (too short) — the stub must absorb it
    val vids = (1L to 8L).map(i =>
      (i, Array.tabulate(8)(j => (i * 10 + j).toByte), "video")) :+
      ((99L, Array[Byte](1, 2), "video"))
    val df = vids.toDF("media_id", "content", "kind").repartition(2)
    val out = Multimodal.withDecodedMeta(df, "media_id", "content",
        "kind", videoCodec = Some(new MultimodalSpec.FakeVideoCodec))
      .collect().map(r => r.getLong(0) -> r).toMap
    (1L to 8L).foreach { i =>
      val r = out(i)
      assert((r.getInt(2), r.getInt(3), r.getLong(4)) ===
        (((i * 10) & 0xFF).toInt, ((i * 10 + 1) & 0xFF).toInt,
          ((i * 10 + 2) & 0xFF).toLong),
        "plugged codec's meta must flow through unchanged")
    }
    // the refused payload degrades THAT ROW to the stub, not the job
    val stub = new Multimodal.StubDecoder
    val (sw, sh, sd, _) = stub.decodeMeta(Array[Byte](1, 2), "video")
    assert((out(99L).getInt(2), out(99L).getInt(3), out(99L).getLong(4))
      === ((sw, sh, sd)))
    // handle economics: the instance ships as CONFIG and acquires its
    // handle lazily on the executor, once per partition — not per row
    assert(MultimodalSpec.FakeVideoCodec.handles.get === 2,
      "one handle per partition (2 partitions)")
    assert(MultimodalSpec.FakeVideoCodec.calls.get === 9,
      "every video row consults the plugged codec")
    // mixed table: image + audio + video through ONE pass, each kind
    // routed to its codec (the q159/q160 entry point unchanged)
    MultimodalSpec.FakeVideoCodec.reset()
    val png = Multimodal.pngBytes(11, 7, seed = 5L)
    val wav = Multimodal.wavBytes(8000, 1, Array[Short](1, 2, 3, 4))
    val mixedAll = Seq(
      (1L, png, "image"), (2L, wav, "audio"),
      (3L, Array.tabulate(8)(j => (40 + j).toByte), "video"))
      .toDF("media_id", "content", "kind")
    val m = Multimodal.withDecodedMeta(mixedAll, "media_id", "content",
        "kind", videoCodec = Some(new MultimodalSpec.FakeVideoCodec))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert((m(1L).getInt(2), m(1L).getInt(3)) === ((11, 7)))
    assert(m(2L).getInt(5) === 8000 && m(2L).getLong(4) === 0L)
    assert((m(3L).getInt(2), m(3L).getInt(3)) === ((40, 41)))
    assert(MultimodalSpec.FakeVideoCodec.calls.get === 1,
      "only video rows reach the video codec")
  }
}

object MultimodalSpec {
  /** Recording fake for the [[Multimodal.VideoCodec]] seam: follows the
    * contract to the letter — serializable CONFIG, a @transient lazy
    * "native handle" acquired on first use on the executor (counted),
    * None for payloads it cannot parse, never throws. The counters
    * prove the partition-wise handle economics a real FFmpeg/JavaCV
    * implementation relies on. */
  object FakeVideoCodec {
    val handles = new java.util.concurrent.atomic.AtomicInteger
    val calls = new java.util.concurrent.atomic.AtomicInteger
    def reset(): Unit = { handles.set(0); calls.set(0) }
  }
  final class FakeVideoCodec extends Multimodal.VideoCodec {
    // never serialized — re-acquired per deserialized instance, i.e.
    // once per task/partition (the seam contract's handle pattern)
    @transient private lazy val handle: AnyRef = {
      FakeVideoCodec.handles.incrementAndGet(); new Object
    }
    def meta(bytes: Array[Byte]): Option[(Int, Int, Long)] = {
      require(handle ne null)
      FakeVideoCodec.calls.incrementAndGet()
      if (bytes == null || bytes.length < 4) None // undecodable → stub
      else Some(((bytes(0) & 0xFF, (bytes(1) & 0xFF),
        (bytes(2) & 0xFF).toLong)))
    }
  }
}
