package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns for the training-data pipeline tier: image/audio/
  * video as opaque `binary` columns with typed metadata, processed
  * batch-wise.
  *
  * IMAGE decode and resize are REAL — [[ImageCodec]] wraps
  * `javax.imageio` (PNG/JPEG/BMP/GIF, stock JRE, no native libs). AUDIO
  * decode is REAL — [[AudioCodec]] hand-parses RIFF/WAVE PCM (8/16-bit,
  * header metadata, mono sample decode, energy-envelope features), pure
  * JVM. VIDEO decode needs an external codec stack, so the engine
  * defines the plugin seam ([[VideoCodec]], contract spelled out there)
  * and ships only the clearly-marked DETERMINISTIC STUB behind it; the
  * stub is also the fallback for payloads the real codecs cannot parse.
  * Everything Spark cares about is real either way: the schema
  * contract, the partition-wise batch shape (codec initialized once per
  * partition, the same pattern a model handle needs), the
  * frame-sampling explode, and the feature-vector output type
  * (`array<float>`, ready for the Similarity operators).
  *
  * Scale notes: media bytes never enter a shuffle — features/metadata are
  * extracted in a narrow mapPartitions stage and the binary column is
  * pruned immediately after; downstream joins run on (id, features).
  */
object Multimodal {

  /** Typed media metadata carried next to the binary payload. */
  val metaSchema: StructType = StructType(Seq(
    StructField("kind", StringType),          // image | audio | video
    StructField("mime", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("duration_ms", LongType),
    StructField("sample_rate", IntegerType)))

  /** Standard media-table schema: id + content + metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("content", BinaryType),
    StructField("meta", metaSchema)))

  // ----------------------------------------------------------- decoding

  /** STUB decoder: a real implementation would hand `content` to a codec;
    * this one derives deterministic pseudo-features so the distributed
    * plumbing is testable offline. One instance per partition — the
    * initialization-cost pattern a real codec/model handle requires. */
  final class StubDecoder extends Serializable {
    def features(content: Array[Byte], dim: Int): Array[Float] = {
      // byte-value histogram folded to `dim` buckets, L1-normalized
      val hist = new Array[Float](dim)
      var i = 0
      while (i < content.length) {
        hist((content(i) & 0xFF) % dim) += 1f
        i += 1
      }
      val total = math.max(1f, content.length.toFloat)
      hist.map(_ / total)
    }

    def decodeMeta(content: Array[Byte], kind: String): (Int, Int, Long, Int) = {
      // the undecodable-payload fallback: real codecs exist for image
      // ([[ImageCodec]]) and audio ([[AudioCodec]]); video plugs in
      // through [[VideoCodec]] (external codec stacks — see the trait
      // for the ??? boundary). The stub derives dims from content
      // length so mixed tables keep flowing deterministically.
      val n = content.length
      kind match {
        case "image" => ((n % 640) + 1, (n % 480) + 1, 0L, 0)
        case "audio" => (0, 0, n.toLong * 8, 16000)
        case _ => ((n % 1920) + 1, (n % 1080) + 1, n.toLong * 4, 0)
      }
    }
  }

  /** REAL audio codec: hand-parsed RIFF/WAVE PCM — 8-bit unsigned and
    * 16-bit signed little-endian, any channel count, chunk-walking
    * parse (fmt/data in any order, unknown chunks skipped, sizes padded
    * to even per the RIFF spec). Pure JVM, no native deps, and fully
    * deterministic: metadata comes from the actual header fields and
    * samples from the actual PCM frames, so the q159/q160 oracles can
    * replay both bit-exactly. Payloads that are not canonical PCM WAV
    * (other containers, compressed codecs, truncated headers) return
    * None so callers fall back to [[StubDecoder]] and mixed tables keep
    * flowing — the [[ImageCodec]] contract. Same one-instance-per-
    * partition handle pattern as the other codecs. */
  final class AudioCodec extends Serializable {
    import AudioCodec.WavMeta

    private def le16(b: Array[Byte], o: Int): Int =
      (b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8)
    private def le32(b: Array[Byte], o: Int): Int =
      (b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8) |
        ((b(o + 2) & 0xFF) << 16) | ((b(o + 3) & 0xFF) << 24)
    private def tag(b: Array[Byte], o: Int): String =
      new String(b, o, 4, java.nio.charset.StandardCharsets.US_ASCII)

    /** Header-only parse — no sample decode, a few dozen bytes per row
      * (the [[ImageCodec.dims]] economics for a 100 TB metadata pass). */
    def meta(bytes: Array[Byte]): Option[WavMeta] = {
      if (bytes == null || bytes.length < 44) return None
      if (tag(bytes, 0) != "RIFF" || tag(bytes, 8) != "WAVE") return None
      // the chunk cursor walks in LONG: a crafted chunk size near
      // Int.MaxValue would wrap an Int cursor (or the bounds sum)
      // negative, pass validation, and the sample decode would then
      // throw or attempt a multi-GB allocation — violating the codec's
      // never-throw/fallback-to-stub contract for crawled media
      var off = 12L
      var fmt: Option[(Int, Int, Int)] = None // channels, rate, bits
      var data: Option[(Int, Int)] = None     // offset, length
      while (off + 8 <= bytes.length && (fmt.isEmpty || data.isEmpty)) {
        val o = off.toInt // off + 8 <= length, so the cast is exact
        val id = tag(bytes, o)
        val sz = le32(bytes, o + 4)
        if (sz < 0 || off + 8L + sz > bytes.length) return None
        id match {
          case "fmt " =>
            if (sz < 16) return None
            val audioFormat = le16(bytes, o + 8)
            if (audioFormat != 1) return None // PCM only
            val ch = le16(bytes, o + 10)
            val rate = le32(bytes, o + 12)
            val bits = le16(bytes, o + 22)
            if (ch < 1 || rate < 1 || (bits != 8 && bits != 16)) return None
            fmt = Some((ch, rate, bits))
          case "data" => data = Some((o + 8, sz))
          case _      => () // skip unknown chunks (LIST, fact, …)
        }
        off += 8L + sz + (sz & 1) // RIFF pads odd chunks to even
      }
      for ((ch, rate, bits) <- fmt; (dOff, dLen) <- data) yield {
        val frameBytes = ch * (bits / 8)
        val nFrames = dLen.toLong / frameBytes
        WavMeta(ch, rate, bits, nFrames,
          nFrames * 1000L / rate, dOff, dLen)
      }
    }

    /** Decode PCM frames to MONO float samples in [-1, 1): 16-bit
      * values map to v/32768 (exact dyadic), 8-bit unsigned to
      * (v-128)/128; multi-channel frames average integer-exactly
      * BEFORE the division (sum/channels truncated — deterministic,
      * engine-portable integer arithmetic, the fixed-point idiom). */
    def samples(bytes: Array[Byte]): Option[Array[Float]] =
      meta(bytes).map { m =>
        val out = new Array[Float](m.nFrames.toInt)
        val frameBytes = m.channels * (m.bitsPerSample / 8)
        var f = 0
        while (f < out.length) {
          val base = m.dataOffset + f * frameBytes
          var acc = 0L
          var c = 0
          while (c < m.channels) {
            acc += (if (m.bitsPerSample == 16)
              le16(bytes, base + c * 2).toShort.toLong
            else (bytes(base + c) & 0xFF) - 128L)
            c += 1
          }
          val mono = acc / m.channels // integer floor-toward-zero
          out(f) =
            if (m.bitsPerSample == 16) mono / 32768.0f else mono / 128.0f
          f += 1
        }
        out
      }

    /** Real frame features for the ANN path: `dim`-window energy
      * envelope — window k covers sample indices [⌊k·n/dim⌋,
      * ⌊(k+1)·n/dim⌋), feature k = Σ|sample| in the window, L1-
      * normalized by the total. Every |sample| is an exact dyadic
      * (≤15 significand bits) and the sums stay exact in binary64, so
      * the envelope is bit-reproducible and SQL-replayable; an
      * all-silence payload yields the zero vector. */
    def energyEnvelope(bytes: Array[Byte], dim: Int): Option[Array[Float]] =
      samples(bytes).map { s =>
        val sums = new Array[Double](dim)
        var k = 0
        while (k < dim) {
          var i = k * s.length / dim
          val end = (k + 1) * s.length / dim
          while (i < end) { sums(k) += math.abs(s(i)); i += 1 }
          k += 1
        }
        val total = sums.sum
        if (total == 0) new Array[Float](dim)
        else sums.map(v => (v / total).toFloat)
      }
  }

  object AudioCodec {
    /** Parsed WAV identity: real header fields plus the PCM frame
      * window ([[AudioCodec.samples]] decodes from it). */
    final case class WavMeta(channels: Int, sampleRate: Int,
                             bitsPerSample: Int, nFrames: Long,
                             durationMs: Long, dataOffset: Int,
                             dataLen: Int)
  }

  /** Canonical 44-byte-header 16-bit PCM WAV from raw samples — the
    * real-bytes fixture generator ([[pngBytes]] for audio). */
  def wavBytes(sampleRate: Int, channels: Int,
               samples: Array[Short]): Array[Byte] = {
    require(sampleRate > 0 && channels > 0, "bad WAV geometry")
    require(samples.length % channels == 0,
      "sample count must be a whole number of frames")
    val dataLen = samples.length * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(channels.toShort).putInt(sampleRate)
      .putInt(sampleRate * channels * 2)
      .putShort((channels * 2).toShort).putShort(16)
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(bb.putShort)
    bb.array()
  }

  /** Fixture generator: one REAL mono 16-bit WAV per row with the given
    * sample-rate / sample-count columns, samples from the SQL-replayable
    * integer stream `s_i = ((id+1)·(i+7)) mod 65536 − 32768` — runs on
    * executors so the encode cost distributes with the data. */
  def synthWavs(df: DataFrame, idCol: String, srCol: String,
                nCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(srCol).cast("int"),
        col(nCol).cast("int"))
      .as[(Long, Int, Int)]
      .mapPartitions(_.map { case (id, sr, n) =>
        val s = Array.tabulate(n)(i =>
          (((id + 1) * (i + 7)) % 65536 - 32768).toShort)
        (id, wavBytes(sr, 1, s))
      })
      .toDF("media_id", "content")
  }

  /** REAL image codec backed by `javax.imageio` — PNG/JPEG/BMP/GIF decode
    * and resize with no native dependencies (stock-JRE readers). Payloads
    * ImageIO cannot parse return None so callers fall back to the
    * [[StubDecoder]] and mixed tables keep flowing. Same
    * one-instance-per-partition handle pattern as the stub. */
  final class ImageCodec extends Serializable {
    // ImageIO's default stream cache writes executor-local temp FILES per
    // decode; in-memory payloads want the memory cache
    javax.imageio.ImageIO.setUseCache(false)

    def decode(bytes: Array[Byte]): Option[java.awt.image.BufferedImage] =
      if (bytes == null || bytes.isEmpty) None
      else
        // NonFatal, not just IOException: the stock readers throw
        // unchecked exceptions on corrupt payloads (truncated GIF →
        // ArrayIndexOutOfBounds, crafted headers → IllegalArgument /
        // NegativeArraySize). One such payload in a 100 TB media table
        // must fall back to the stub, not abort the job.
        try Option(javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(bytes)))
        catch { case scala.util.control.NonFatal(_) => None }

    /** Width/height from the image HEADER via the format reader — no
      * pixel decode, no BufferedImage allocation. Over a metadata pass
      * on a 100 TB media table this is the difference between reading a
      * few dozen header bytes per row and decoding every pixel. */
    def dims(bytes: Array[Byte]): Option[(Int, Int)] =
      if (bytes == null || bytes.isEmpty) None
      else
        try {
          val stream = javax.imageio.ImageIO.createImageInputStream(
            new java.io.ByteArrayInputStream(bytes))
          try {
            val readers = javax.imageio.ImageIO.getImageReaders(stream)
            if (!readers.hasNext) None
            else {
              val r = readers.next()
              try {
                r.setInput(stream)
                Some((r.getWidth(0), r.getHeight(0)))
              } finally r.dispose()
            }
          } finally stream.close()
        } catch { case scala.util.control.NonFatal(_) => None }

    /** Decode → scale both dims by 1/factor (floor, min 1) → re-encode
      * PNG. None when the payload isn't a decodable image. */
    def resize(bytes: Array[Byte], factor: Int): Option[Array[Byte]] =
      decode(bytes).map { img =>
        val w = math.max(1, img.getWidth / factor)
        val h = math.max(1, img.getHeight / factor)
        val out = new java.awt.image.BufferedImage(w, h,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g = out.createGraphics()
        try g.drawImage(img, 0, 0, w, h, null) finally g.dispose()
        Multimodal.encodePng(out)
      }
  }

  private[graft] def encodePng(img: java.awt.image.BufferedImage): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Deterministic REAL PNG of the given dimensions: pixel values from a
    * cheap seeded mix (the bytes only need to be a decodable image — the
    * codec roundtrip verifies DIMENSIONS, not pixels). Fixture generator
    * for the real-codec queries and specs. */
  def pngBytes(width: Int, height: Int, seed: Long): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(width, height,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var s = seed
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        s = s * 6364136223846793005L + 1442695040888963407L
        img.setRGB(x, y, ((s >>> 40) & 0xFFFFFF).toInt)
        x += 1
      }
      y += 1
    }
    encodePng(img)
  }

  /** Partition-wise feature extraction: binary → `array<float>` embedding
    * column usable by [[Similarity]]. The decoder is constructed once per
    * partition, NOT once per row. */
  def featurize(df: DataFrame, idCol: String, contentCol: String,
                dim: Int = 64): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("media_id"), col(contentCol).as("c"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val decoder = new StubDecoder // per-partition init
        it.map { case (id, bytes) => (id, decoder.features(bytes, dim)) }
      }
      .toDF("media_id", "features")
  }

  /** Frame sampling: split the payload into fixed-size frames, keep every
    * `everyN`-th, explode to (id, frame_idx, frame) rows — the batch
    * shape video pipelines need. Pure column program (codegen'd); the
    * binary is pruned right after the explode projection. */
  def sampleFrames(df: DataFrame, idCol: String, contentCol: String,
                   frameSize: Int, everyN: Int = 1): DataFrame = {
    val c = col(contentCol)
    val nFrames = ceil(length(c).cast("double") / frameSize).cast("int")
    // sequence(0, -1) would count DOWN (step auto-negates); empty payloads
    // must yield an empty frame list instead
    val idx = when(nFrames <= 0, array().cast("array<int>"))
      .otherwise(filter(sequence(lit(0), nFrames - 1),
        i => pmod(i, lit(everyN)) === 0))
    df.select(col(idCol).as("media_id"),
        explode(transform(idx, i =>
          struct(i.as("frame_idx"),
            c.substr(i * frameSize + 1, lit(frameSize)).as("frame")))).as("f"))
      .select(col("media_id"), col("f.frame_idx"), col("f.frame"))
  }

  /** STUB resize: a real implementation hands the payload to an image
    * codec and re-encodes at the target size; the stub keeps every
    * `factor`-th byte — deterministic, SQL-mirrorable, and shaped like
    * the real thing (payload in, smaller payload out). */
  def resizePayload(content: Array[Byte], factor: Int): Array[Byte] = {
    val out = new Array[Byte]((content.length + factor - 1) / factor)
    var i = 0
    var k = 0
    while (i < content.length) { out(k) = content(i); k += 1; i += factor }
    out
  }

  /** Partition-wise stub resize: binary → smaller binary, decoder-handle
    * pattern like [[featurize]]. The binary never shuffles — the narrow
    * map stage rewrites it in place. */
  def resized(df: DataFrame, idCol: String, contentCol: String,
              factor: Int): DataFrame = {
    require(factor >= 1, "factor must be >= 1")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("media_id"), col(contentCol).as("c"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val _ = new StubDecoder // per-partition init, as a real codec needs
        it.map { case (id, bytes) => (id, resizePayload(bytes, factor)) }
      }
      .toDF("media_id", "content")
  }

  /** The VIDEO-codec plugin point. Real video decode needs an external
    * codec stack (FFmpeg/JavaCV JNI — not in a stock JRE and not in
    * this container), so the engine defines the seam and ships only the
    * stub behind it. Contract, matching the other codecs:
    *
    *  - implementations must be `Serializable` CONFIG (paths, options)
    *    — never hold native handles in fields; acquire them lazily on
    *    the executor (first call), because the instance is constructed
    *    on the driver and shipped in the task closure;
    *  - one instance serves a whole partition sequentially (no
    *    thread-safety requirement), the [[ImageCodec]] handle pattern;
    *  - `meta` returns None for payloads the codec cannot parse —
    *    callers MUST fall back to [[StubDecoder]] so one corrupt
    *    payload in a 100 TB media table degrades that row, not the job;
    *  - never throw for data-shaped failures (the NonFatal-to-None rule
    *    the image codec documents). */
  trait VideoCodec extends Serializable {
    /** (width, height, duration_ms), or None if undecodable. */
    def meta(bytes: Array[Byte]): Option[(Int, Int, Long)]
  }

  /** Metadata decode over the media table (mapPartitions batch): image
    * rows go through the REAL [[ImageCodec]] (actual decoded
    * dimensions), audio rows through the REAL [[AudioCodec]] (actual
    * RIFF/WAVE header fields); video rows go to `videoCodec` when the
    * caller plugs one in ([[VideoCodec]] — external codec stacks only).
    * Payloads a codec cannot parse — and video with no codec plugged —
    * fall back to the documented stub, so mixed tables keep flowing. */
  def withDecodedMeta(df: DataFrame, idCol: String, contentCol: String,
                      kindCol: String,
                      videoCodec: Option[VideoCodec] = None): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(contentCol), col(kindCol))
      .as[(Long, Array[Byte], String)]
      .mapPartitions { it =>
        val codec = new ImageCodec // per-partition init
        val audio = new AudioCodec
        val stub = new StubDecoder
        it.map { case (id, bytes, kind) =>
          val (w, h, d, sr) = kind match {
            case "image" =>
              codec.dims(bytes).map { case (iw, ih) => (iw, ih, 0L, 0) }
                .getOrElse(stub.decodeMeta(bytes, kind))
            case "audio" =>
              audio.meta(bytes).map(m => (0, 0, m.durationMs, m.sampleRate))
                .getOrElse(stub.decodeMeta(bytes, kind))
            case _ =>
              videoCodec.flatMap(_.meta(bytes))
                .map { case (vw, vh, vd) => (vw, vh, vd, 0) }
                .getOrElse(stub.decodeMeta(bytes, kind))
          }
          (id, kind, w, h, d, sr)
        }
      }
      .toDF("media_id", "kind", "width", "height", "duration_ms", "sample_rate")
  }

  /** Partition-wise REAL audio featurization: binary WAV →
    * `array<float>` energy envelope ([[AudioCodec.energyEnvelope]]),
    * ready for the [[Similarity]] operators; non-WAV payloads fall back
    * to the stub histogram (mixed-table contract). Same narrow-stage,
    * codec-per-partition shape as [[featurize]] — the binary never
    * shuffles. */
  def audioFeatures(df: DataFrame, idCol: String, contentCol: String,
                    dim: Int = 64): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("media_id"), col(contentCol).as("c"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val audio = new AudioCodec // per-partition init
        val stub = new StubDecoder
        it.map { case (id, bytes) =>
          (id, audio.energyEnvelope(bytes, dim)
            .getOrElse(stub.features(bytes, dim)))
        }
      }
      .toDF("media_id", "features")
  }

  /** REAL image resize: decode via [[ImageCodec]], scale dims by
    * 1/factor (floor, min 1), re-encode PNG; undecodable payloads fall
    * back to the stub byte-drop so mixed tables keep flowing. The binary
    * never shuffles — a narrow map stage rewrites it in place, codec
    * constructed once per partition. */
  def resizedImage(df: DataFrame, idCol: String, contentCol: String,
                   factor: Int): DataFrame = {
    require(factor >= 1, "factor must be >= 1")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("media_id"), col(contentCol).as("c"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val codec = new ImageCodec
        it.map { case (id, bytes) =>
          (id, codec.resize(bytes, factor)
            .getOrElse(resizePayload(bytes, factor)))
        }
      }
      .toDF("media_id", "content")
  }

  /** 64-bit difference-hash (dHash) perceptual signature over REAL
    * decoded pixels: gray levels `(r+g+b)/3` are sampled on a 9×8
    * nearest-neighbor grid (`gx(i) = ⌊i·w/9⌋`, `gy(j) = ⌊j·h/8⌋`) and
    * bit `j·8+i` is set when the right neighbor is brighter — the
    * standard row-gradient dHash, fixed-grid so the hash is a pure
    * integer function of the decoded pixels (engine-portable).
    * Undecodable payloads hash to null (they cannot perceptually match
    * anything). Compose with [[Dedup.signatureNearDupPairs]] for
    * near-dup image pairs and [[Dedup.connectedComponents]] for image
    * dedup clusters.
    *
    * Scale shape: one narrow mapPartitions (codec per partition, binary
    * never shuffles); downstream dedup carries only (id, 8-byte hash). */
  def dHash(df: DataFrame, idCol: String, contentCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("media_id"), col(contentCol).as("c"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val codec = new ImageCodec // per-partition init
        it.map { case (id, bytes) =>
          (id, codec.decode(bytes).map { img =>
            val (w, h) = (img.getWidth, img.getHeight)
            def gray(x: Int, y: Int): Int = {
              val p = img.getRGB(x, y) & 0xFFFFFF
              (((p >> 16) & 255) + ((p >> 8) & 255) + (p & 255)) / 3
            }
            val gx = Array.tabulate(9)(i => i * w / 9)
            val gy = Array.tabulate(8)(j => j * h / 8)
            var hsh = 0L
            var j = 0
            while (j < 8) {
              var i = 0
              while (i < 8) {
                if (gray(gx(i + 1), gy(j)) > gray(gx(i), gy(j)))
                  hsh |= 1L << (j * 8 + i)
                i += 1
              }
              j += 1
            }
            hsh
          })
        }
      }
      .toDF("media_id", "dhash")
  }

  /** Fixture generator: one REAL PNG per row with the given dimension
    * columns (int), seeded by the id — runs on executors so the encode
    * cost distributes with the data. */
  def synthImages(df: DataFrame, idCol: String, wCol: String,
                  hCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(wCol).cast("int"),
        col(hCol).cast("int"))
      .as[(Long, Int, Int)]
      .mapPartitions(_.map { case (id, w, h) => (id, pngBytes(w, h, id)) })
      .toDF("media_id", "content")
  }
}
