package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns for the training-data pipeline tier: image/audio/
  * video as opaque `binary` columns with typed metadata, processed
  * batch-wise.
  *
  * IMAGE decode and resize are REAL — [[ImageCodec]] wraps
  * `javax.imageio` (PNG/JPEG/BMP/GIF, stock JRE, no native libs).
  * Audio/video decode stays a clearly-marked DETERMINISTIC STUB (those
  * codecs are not in this container), as does the fallback for payloads
  * ImageIO cannot parse. Everything Spark cares about is real either
  * way: the schema contract, the partition-wise batch shape (codec
  * initialized once per partition, the same pattern a model handle
  * needs), the frame-sampling explode, and the feature-vector output
  * type (`array<float>`, ready for the Similarity operators).
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
      // ??? real codec goes here; stub derives dims from content length
      val n = content.length
      kind match {
        case "image" => ((n % 640) + 1, (n % 480) + 1, 0L, 0)
        case "audio" => (0, 0, n.toLong * 8, 16000)
        case _ => ((n % 1920) + 1, (n % 1080) + 1, n.toLong * 4, 0)
      }
    }
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

  /** Metadata decode over the media table (mapPartitions batch): image
    * rows go through the REAL [[ImageCodec]] (actual decoded dimensions);
    * payloads ImageIO cannot parse — and the audio/video kinds, whose
    * codecs aren't in a stock JRE — fall back to the documented stub. */
  def withDecodedMeta(df: DataFrame, idCol: String, contentCol: String,
                      kindCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(contentCol), col(kindCol))
      .as[(Long, Array[Byte], String)]
      .mapPartitions { it =>
        val codec = new ImageCodec // per-partition init
        val stub = new StubDecoder
        it.map { case (id, bytes, kind) =>
          val (w, h, d, sr) =
            if (kind == "image")
              codec.dims(bytes).map { case (iw, ih) => (iw, ih, 0L, 0) }
                .getOrElse(stub.decodeMeta(bytes, kind))
            else stub.decodeMeta(bytes, kind)
          (id, kind, w, h, d, sr)
        }
      }
      .toDF("media_id", "kind", "width", "height", "duration_ms", "sample_rate")
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
