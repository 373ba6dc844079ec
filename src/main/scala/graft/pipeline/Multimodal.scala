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
  * exact generator formula). AUDIO decode is REAL for WAV/PCM16:
  * [[decodeWav]] walks the RIFF container directly (raw samples need no
  * codec library) with [[syntheticWav]] as its oracle-replayable
  * generator. VIDEO decode is REAL for MJPEG / motion-PNG AVIs:
  * [[decodeAviFrames]] walks the AVI RIFF container and decodes every
  * sampled frame through javax.imageio ([[syntheticAvi]] is the
  * oracle-replayable generator). Only inter-frame video codecs
  * (H.264/VP9/HEVC) and compressed audio (MP3/AAC) remain a STUB
  * ([[decodeImageStub]] / [[sampleFrames]]) — those codecs are not in
  * this container — with the batch plumbing (schema, per-partition
  * decoder amortization, per-row purity) real and tested.
  */
object Multimodal {

  // javax.imageio defaults to DISK-backed stream caches: every
  // ImageIO.read/write call materializes (and deletes) a temp file even
  // when the source/sink is an in-memory byte array. Flip to memory-
  // cached streams once per JVM — same bytes, no per-call filesystem
  // round-trip (this was also the round-5 q_video_frames/q_image_decode
  // "drift": temp-file churn is maximally sensitive to disk co-tenancy).
  javax.imageio.ImageIO.setUseCache(false)

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
      val img0 = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(payload))
      if (img0 == null) None
      else {
        // palette-indexed formats (GIF, 8-bit BMP): raster band 0 is the
        // palette INDEX, not the pixel — resolve through the palette
        // (drawImage copies palette entries verbatim, no colorspace
        // math) so px_sum means the same thing in every format
        val img =
          if (img0.getType == java.awt.image.BufferedImage.TYPE_BYTE_INDEXED ||
            img0.getType == java.awt.image.BufferedImage.TYPE_BYTE_BINARY) {
            val c = new java.awt.image.BufferedImage(img0.getWidth,
              img0.getHeight, java.awt.image.BufferedImage.TYPE_INT_RGB)
            val g = c.createGraphics()
            g.drawImage(img0, 0, 0, null)
            g.dispose()
            c
          } else img0
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

  // ---- REAL audio decode (RIFF/WAV PCM16 — a container with raw
  // samples, parsed directly; no codec library involved) ----------------

  /** Deterministic mono PCM16 WAV at 8 kHz: n = 32 + id mod 32 samples,
    * sample(i) = ((id·131 + i·31) mod 4001) − 2000 — a pure function of
    * id, so an SQL oracle recomputes the decoded sample statistics
    * without touching the bytes. */
  def syntheticWav(id: Long, sampleRate: Int = 8000): Array[Byte] = {
    val n = (32 + (id % 32)).toInt
    val dataLen = n * 2
    val out = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    out.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(1) // mono
      .putInt(sampleRate).putInt(sampleRate * 2)
      .putShort(2) // block align
      .putShort(16) // bits/sample
    out.put("data".getBytes("US-ASCII")).putInt(dataLen)
    var i = 0
    while (i < n) {
      out.putShort((((id * 131 + i * 31) % 4001) - 2000).toShort)
      i += 1
    }
    out.array()
  }

  /** REAL WAV decode: RIFF chunk walk → PCM16 samples → (sample_rate,
    * n_samples, Σ|sample|, max|sample|). None for anything that is not a
    * well-formed mono/stereo PCM16 WAV — one corrupt payload in 10^12
    * must degrade to a dropped row, never a task failure. */
  def decodeWav(payload: Array[Byte]): Option[(Int, Long, Long, Long)] =
    try {
      val buf = java.nio.ByteBuffer.wrap(payload)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      def tag(): String = {
        val b = new Array[Byte](4); buf.get(b); new String(b, "US-ASCII")
      }
      if (tag() != "RIFF") return None
      buf.getInt // riff size (unchecked: truncated files fail at get)
      if (tag() != "WAVE") return None
      var rate = -1
      var channels = -1
      var bits = -1
      var pcm = false
      var stats: Option[(Long, Long, Long)] = None
      while (buf.remaining() >= 8 && stats.isEmpty) {
        val id = tag()
        val len = buf.getInt
        if (len < 0 || len > buf.remaining()) return None
        val next = buf.position() + len + (len & 1) // chunks are word-aligned
        id match {
          case "fmt " =>
            // a fmt chunk shorter than the 16 PCM-format bytes would let
            // the reads below spill into the NEXT chunk and parse garbage
            // as rate/channels/bits — reject instead of misdecoding
            if (len < 16) return None
            pcm = buf.getShort == 1
            channels = buf.getShort.toInt
            rate = buf.getInt
            buf.getInt; buf.getShort // byte rate, block align
            bits = buf.getShort.toInt
          case "data" =>
            if (!pcm || bits != 16 || channels < 1 || channels > 2 ||
              rate <= 0) return None
            val n = len / 2 / channels
            var absSum = 0L
            var maxAbs = 0L
            var i = 0
            while (i < n.toLong * channels) {
              val v = math.abs(buf.getShort.toLong)
              absSum += v
              if (v > maxAbs) maxAbs = v
              i += 1
            }
            stats = Some((n.toLong, absSum, maxAbs))
          case _ => () // skip LIST/INFO/etc.
        }
        buf.position(math.min(next, buf.limit()))
      }
      stats.map { case (n, s, m) => (rate, n, s, m) }
    } catch { case _: Exception => None }

  final case class AudioFeatures(media_id: Long, sample_rate: Int,
                                 n_samples: Long, abs_sum: Long,
                                 max_abs: Long)

  /** Real audio feature extraction, batched per partition like
    * [[decodeImages]]; undecodable payloads are dropped. Shuffle-free. */
  def decodeAudios(spark: SparkSession, media: DataFrame): Dataset[AudioFeatures] = {
    import spark.implicits._
    media.select("media_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, payload) =>
        decodeWav(payload).map { case (r, n, s, m) =>
          AudioFeatures(id, r, n, s, m) }
      })
  }

  // ---- REAL video decode (AVI container walk — the same RIFF
  // discipline as WAV; MJPEG/motion-PNG frame payloads decode through
  // javax.imageio, base JDK, no codec library) -------------------------

  /** Deterministic motion-PNG AVI: 2 + id mod 3 frames of w×h grayscale,
    * pixel(x, y, f) = (id·31 + f·17 + x·7 + y·13) mod 256. PNG frames
    * (lossless) keep the decode oracle-checkable by formula replay; real
    * MJPEG files with JPEG frames walk the identical container path
    * (covered in tests with dimension assertions — JPEG is lossy). */
  def syntheticAvi(id: Long, w: Int = 8, h: Int = 8): Array[Byte] = {
    val nFrames = (2 + id % 3).toInt
    val frames = (0 until nFrames).map { f =>
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val v = ((id * 31 + f * 17 + x * 7 + y * 13) % 256).toInt
          img.setRGB(x, y, (v << 16) | (v << 8) | v)
          x += 1
        }
        y += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    buildAvi(frames, w, h)
  }

  /** Assemble a minimal standards-shaped AVI (RIFF → LIST hdrl(avih) →
    * LIST movi('00dc' frames, word-aligned)) around already-encoded
    * frame payloads. */
  def buildAvi(frames: Seq[Array[Byte]], w: Int, h: Int): Array[Byte] = {
    def chunk(tag: String, body: Array[Byte]): Array[Byte] = {
      val pad = body.length & 1
      val out = java.nio.ByteBuffer.allocate(8 + body.length + pad)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      out.put(tag.getBytes("US-ASCII")).putInt(body.length).put(body)
      out.array()
    }
    def list(listType: String, body: Array[Byte]): Array[Byte] =
      chunk("LIST", listType.getBytes("US-ASCII") ++ body)
    val avih = java.nio.ByteBuffer.allocate(56)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    avih.putInt(33333).putInt(0).putInt(0).putInt(0) // µs/frame, bps, pad, flags
      .putInt(frames.size).putInt(0).putInt(1).putInt(0) // total, init, streams, buf
      .putInt(w).putInt(h) // dwWidth, dwHeight; 16 reserved bytes stay 0
    val hdrl = list("hdrl", chunk("avih", avih.array()))
    val movi = list("movi",
      frames.iterator.flatMap(f => chunk("00dc", f)).toArray)
    chunk("RIFF", "AVI ".getBytes("US-ASCII") ++ hdrl ++ movi)
  }

  final case class VideoFrame(frame_idx: Int, width: Int, height: Int,
                              px_sum: Long)

  /** REAL video decode: RIFF/AVI chunk walk + per-frame image decode
    * (javax.imageio) for every `stride`-th '..dc'/'..db' frame chunk —
    * covers MJPEG and motion-PNG AVIs with zero codec dependencies.
    * Inter-frame compressed codecs (H.264/VP9/HEVC) are NOT decodable
    * in this container; such files yield no decodable frames ⇒ None.
    * Malformed/truncated payloads degrade to None, never a task
    * failure. Undecodable individual frames are skipped (a corrupt
    * frame in a long video must not drop the video). */
  def decodeAviFrames(payload: Array[Byte],
                      stride: Int = 1): Option[Vector[VideoFrame]] =
    try {
      require(stride >= 1, s"stride must be >= 1, got $stride")
      val buf = java.nio.ByteBuffer.wrap(payload)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      def tag(): String = {
        val b = new Array[Byte](4); buf.get(b); new String(b, "US-ASCII")
      }
      if (tag() != "RIFF") return None
      buf.getInt
      if (tag() != "AVI ") return None
      val out = Vector.newBuilder[VideoFrame]
      var idx = 0
      def walk(end: Int): Unit =
        while (buf.position() + 8 <= end) {
          val id = tag()
          val len = buf.getInt
          // subtraction, not addition: `position + len` overflows Int for
          // a crafted ~2GB size field, which would skip this guard and
          // attempt the allocation (OutOfMemoryError is an Error — it
          // would escape the Exception catch and fail the task)
          if (len < 0 || len > buf.limit() - buf.position())
            throw new IllegalArgumentException("truncated chunk")
          val next = buf.position() + len + (len & 1)
          if (id == "LIST" && len >= 4) {
            tag() // list type; frames live under 'movi' but any nesting walks
            walk(math.min(next, end))
          } else if ((id.endsWith("dc") || id.endsWith("db")) && len > 0) {
            if (idx % stride == 0) {
              val bytes = new Array[Byte](len)
              buf.get(bytes)
              decodeImage(bytes).foreach { case (fw, fh, s) =>
                out += VideoFrame(idx, fw, fh, s)
              }
            }
            idx += 1
          }
          buf.position(math.min(next, buf.limit()))
        }
      walk(buf.limit())
      val frames = out.result()
      if (frames.isEmpty) None else Some(frames)
    } catch { case _: Exception => None }

  final case class VideoFrameRow(media_id: Long, frame_idx: Int, width: Int,
                                 height: Int, px_sum: Long)

  /** Real video keyframe sampling over a media table: one input row →
    * one row per sampled decoded frame (the shape of training-data frame
    * extraction). Per-partition batched, shuffle-free; undecodable
    * payloads drop. */
  def decodeVideoFrames(spark: SparkSession, media: DataFrame,
                        stride: Int = 1): Dataset[VideoFrameRow] = {
    import spark.implicits._
    media.select("media_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, p) =>
        decodeAviFrames(p, stride).getOrElse(Vector.empty).map(f =>
          VideoFrameRow(id, f.frame_idx, f.width, f.height, f.px_sum))
      })
  }

  /** STUB decoder for payloads in codecs this container cannot decode
    * (inter-frame video: H.264/VP9/HEVC; compressed audio: MP3/AAC).
    * Deterministic byte-derived fake:
    * "dimensions" from the payload length, "mean" over the bytes, crc
    * over the head. The point under test is the batch plumbing, not the
    * samples. */
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
