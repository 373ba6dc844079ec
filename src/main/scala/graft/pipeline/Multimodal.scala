package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `BINARY`
  * columns with typed metadata, processed batch-wise per partition.
  *
  * IMAGE decode is REAL: [[decodeImage]] reads PNG/JPEG through
  * `javax.imageio` (base JDK — no external codec dependency) and
  * extracts true pixel dimensions + pixel-sum features;
  * [[syntheticPng]] generates deterministic PNGs so correctness is
  * oracle-checkable end-to-end (PNG is lossless: decode returns the
  * exact generator formula). AUDIO/VIDEO decode remains a STUB
  * ([[decodeImageStub]] / [[sampleFrames]]) — those codecs are not in
  * this container — with the batch plumbing (schema, per-partition
  * decoder amortization, per-row purity) real and tested.
  */
object Multimodal {

  final case class MediaRow(media_id: Long, kind: String, payload: Array[Byte])
  final case class MediaFeatures(media_id: Long, kind: String, n_bytes: Long,
                                 byte_sum: Long, head_crc: Long,
                                 width: Int, height: Int)

  /** Attach a fake media payload to any (id, text) table — stands in for
    * reading a real WARC/image store. Deterministic from the text. */
  def asMedia(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).cast("long").as("media_id"),
      (when(col(idCol) % 2 === 0, "image").otherwise("audio")).as("kind"),
      encode(col(textCol), "UTF-8").as("payload"))

  // ---- REAL image decode (javax.imageio, base JDK) -------------------

  /** Deterministic grayscale PNG: pixel(x, y) = (id·31 + x·7 + y·13) mod
    * 256 — a pure function of (id, w, h), so an SQL oracle can recompute
    * the expected decode output without touching the bytes. */
  def syntheticPng(id: Long, w: Int = 8, h: Int = 8): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val v = ((id * 31 + x * 7 + y * 13) % 256).toInt
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** REAL decode: PNG/JPEG bytes → (width, height, pixel sum of the
    * first band). None when the payload is not a decodable image —
    * malformed media must degrade to a row-level null, never a task
    * failure (one corrupt image in 10^12 can't kill a job). */
  def decodeImage(payload: Array[Byte]): Option[(Int, Int, Long)] =
    try {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(payload))
      if (img == null) None
      else {
        val raster = img.getRaster
        var sum = 0L
        var y = 0
        while (y < img.getHeight) {
          var x = 0
          while (x < img.getWidth) {
            sum += raster.getSample(x, y, 0)
            x += 1
          }
          y += 1
        }
        Some((img.getWidth, img.getHeight, sum))
      }
    } catch { case _: Exception => None }

  final case class ImageFeatures(media_id: Long, width: Int, height: Int,
                                 px_sum: Long)

  /** Real image feature extraction, batched per partition like
    * [[extractFeatures]]; undecodable payloads are dropped (logged by
    * count upstream if needed). Shuffle-free. */
  def decodeImages(spark: SparkSession, media: DataFrame): Dataset[ImageFeatures] = {
    import spark.implicits._
    media.select("media_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, payload) =>
        decodeImage(payload).map { case (w, h, s) => ImageFeatures(id, w, h, s) }
      })
  }

  /** STUB decoder for AUDIO/VIDEO payloads (codecs not in this
    * container). Deterministic byte-derived fake: "dimensions" from the
    * payload length, "mean" over the bytes, crc over the head. The point
    * under test is the batch plumbing, not the samples. */
  def decodeImageStub(payload: Array[Byte]): (Int, Int, Long, Long) = {
    val n = payload.length
    val width = math.max(1, n % 640)
    val height = math.max(1, (n / 3) % 480)
    var sum = 0L
    var i = 0
    while (i < n) { sum += payload(i) & 0xFF; i += 1 }
    val crc = new java.util.zip.CRC32()
    crc.update(payload, 0, math.min(64, n))
    (width, height, sum, crc.getValue)
  }

  /** Feature extraction, batched per partition: the decoder state is
    * created once per partition and reused — the executor-side shape a
    * real codec (or mapInPandas batch) needs. Per-row, shuffle-free. */
  def extractFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      // per-partition "decoder" init happens here (stubbed)
      rows.map { r =>
        val (w, h, byteSum, crc) = decodeImageStub(r.payload)
        MediaFeatures(r.media_id, r.kind, r.payload.length.toLong,
          byteSum, crc, w, h)
      }
    }
  }

  // ---- resize / frame-sample: the remaining pipeline verbs. Real
  // audio/video codecs go behind these seams; the deterministic fakes
  // keep the Spark-side contract (schema, batching, per-row purity)
  // testable. ----

  final case class ResizedRow(media_id: Long, width: Int, height: Int,
                              payload: Array[Byte])

  /** STUB resize: deterministic byte-decimation to a target "resolution"
    * — stands in for a real image resize kernel. Output payload length is
    * a pure function of (input length, target dims). */
  def resizeStub(payload: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val target = math.max(1, math.min(payload.length, w * h / 64))
    val out = new Array[Byte](target)
    val step = math.max(1, payload.length / target)
    var i = 0
    while (i < target) { out(i) = payload(math.min(i * step, payload.length - 1)); i += 1 }
    out
  }

  def resize(spark: SparkSession, media: DataFrame, w: Int, h: Int): Dataset[ResizedRow] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions(_.map { r =>
      ResizedRow(r.media_id, w, h, resizeStub(r.payload, w, h))
    })
  }

  final case class FrameRow(media_id: Long, frame_idx: Int, frame_crc: Long)

  /** STUB frame sampling: treat the payload as `nFrames` equal spans and
    * emit every `stride`-th span's crc — the shape of video keyframe
    * extraction (one input row → many frame rows, still shuffle-free). */
  def sampleFrames(spark: SparkSession, media: DataFrame, nFrames: Int,
                   stride: Int): Dataset[FrameRow] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions(_.flatMap { r =>
      val span = math.max(1, r.payload.length / math.max(nFrames, 1))
      (0 until nFrames by stride).iterator.map { f =>
        val from = math.min(f * span, math.max(r.payload.length - 1, 0))
        val until = math.min(from + span, r.payload.length)
        val crc = new java.util.zip.CRC32()
        if (until > from) crc.update(r.payload, from, until - from)
        FrameRow(r.media_id, f, crc.getValue)
      }
    })
  }
}
