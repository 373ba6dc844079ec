package graft.pipeline

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** IVF ANN + multimodal resize/frame-sample verbs. */
class PipelineExtrasSpec extends AnyFunSuite with SparkTestBase {

  private def embeddings(n: Int, dim: Int, clusters: Int) = {
    val sp = spark
    import sp.implicits._
    val rnd = new scala.util.Random(4242L)
    val centers = Array.fill(clusters)(Array.fill(dim)(rnd.nextGaussian() * 5))
    (0 until n).map { i =>
      val c = centers(i % clusters)
      (i.toLong, c.map(x => (x + rnd.nextGaussian() * 0.3).toFloat).toSeq)
    }.toDF("vec_id", "embedding")
  }

  test("IVF: centroids converge to planted clusters; probed top-k has " +
    "high recall vs exact") {
    val emb = embeddings(300, 16, 4).cache()
    val cents = VectorOps.trainIvfCentroids(emb, "vec_id", "embedding",
      k = 4, iters = 6)
    val q = emb.where(col("vec_id") === 1)
      .select("embedding").head().getSeq[Float](0)
    val exact = VectorOps.cosineTopK(emb, "vec_id", "embedding", q, 10)
      .collect().map(_.getLong(0)).toSet
    val ivf = VectorOps.ivfTopK(emb, "vec_id", "embedding", q, 10, cents,
      nprobe = 2).collect().map(_.getLong(0)).toSet
    val recall = (exact intersect ivf).size.toDouble / exact.size
    assert(recall >= 0.9, s"recall=$recall exact=$exact ivf=$ivf")
    // nprobe = all clusters ⇒ identical to exact
    val all = VectorOps.ivfTopK(emb, "vec_id", "embedding", q, 10, cents,
      nprobe = 4).collect().map(_.getLong(0)).toSet
    assert(all == exact)
    // TRAIN-ON-SAMPLE (the 100-TB API default): centroids trained on
    // half the corpus must not cost recall — the quantizer needs a
    // representative sample, not the corpus
    val sampled = VectorOps.trainIvfCentroids(emb, "vec_id", "embedding",
      k = 4, iters = 6, maxTrainRows = 150)
    val ivfS = VectorOps.ivfTopK(emb, "vec_id", "embedding", q, 10, sampled,
      nprobe = 2).collect().map(_.getLong(0)).toSet
    val recallS = (exact intersect ivfS).size.toDouble / exact.size
    assert(recallS >= 0.9, s"sample-path recall=$recallS")
  }

  test("bucketed cosine near-dup: subset of exact pairs, high recall on " +
    "planted near-duplicates, and no bucket-spanning false positives") {
    val sp = spark
    import sp.implicits._
    val rnd = new scala.util.Random(777L)
    val dim = 64
    // 120 random vectors + 20 planted near-dup twins (cosine ≈ 0.99)
    val base = (0 until 120).map(i =>
      (i.toLong, Array.fill(dim)(rnd.nextGaussian().toFloat).toSeq))
    val twins = (0 until 20).map { i =>
      val v = base(i)._2
      ((1000 + i).toLong, v.map(x => x + rnd.nextGaussian().toFloat * 0.02f))
    }
    val emb = (base ++ twins).toDF("vec_id", "embedding").cache()
    val exact = VectorOps.cosineNearDupPairs(emb, "vec_id", "embedding",
        threshold = 0.8, nPlanes = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val planted = (0 until 20).map(i => (i.toLong, (1000 + i).toLong)).toSet
    assert(planted.subsetOf(exact.map { case (a, b) => (math.min(a, b), math.max(a, b)) }))
    val bucketed = VectorOps.cosineNearDupPairs(emb, "vec_id", "embedding",
        threshold = 0.8, seeds = (0 until 8).map(i => 42L + i), nPlanes = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // exactness of the verify step: every reported pair is a true pair
    assert(bucketed.subsetOf(exact),
      s"false positives: ${bucketed -- exact}")
    // recall on the planted high-cosine twins (per-seed collision prob
    // (1-θ/π)^4 ≈ 0.93 at cosine .99; 8 seeds ⇒ ~1-2e-9 each)
    val found = bucketed.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
    val recall = (planted intersect found).size.toDouble / planted.size
    assert(recall >= 0.9, s"planted recall=$recall")
  }

  test("nearDupComponents: transitive chains collapse to the smallest id; " +
    "singletons keep themselves") {
    val sp = spark
    import sp.implicits._
    // components: {1,2,3,4} (chain), {10,11}, {20,21,22} (star), {99}
    val ids = Seq(1L, 2L, 3L, 4L, 10L, 11L, 20L, 21L, 22L, 99L).toDF("id")
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L),
      (20L, 21L), (20L, 22L)).toDF("id_a", "id_b")
    val got = TextOps.nearDupComponents(ids, "id", pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L, 22L -> 20L, 99L -> 99L))
    // survivors = distinct keep_ids; dropped = everything else
    assert(got.values.toSet == Set(1L, 10L, 20L, 99L))
  }

  test("nearDupComponents matches a union-find oracle on random graphs " +
    "and converges logarithmically on an adversarial chain") {
    val sp = spark
    import sp.implicits._
    // union-find oracle
    def ufComponents(n: Int, pairs: Seq[(Long, Long)]): Map[Long, Long] = {
      val parent = Array.tabulate(n)(identity)
      def find(x: Int): Int = {
        var r = x
        while (parent(r) != r) r = parent(r)
        var c = x
        while (parent(c) != c) { val nx = parent(c); parent(c) = r; c = nx }
        r
      }
      pairs.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      // root = min of component by construction (always union into min)
      (0 until n).map(i => i.toLong -> find(i).toLong).toMap
    }
    val rnd = new scala.util.Random(4242L)
    for (trial <- 0 until 3) {
      val n = 120 + trial * 40
      val pairs = (0 until n / 2).map { _ =>
        val a = rnd.nextInt(n); val b = rnd.nextInt(n)
        (math.min(a, b).toLong, math.max(a, b).toLong)
      }.filter(p => p._1 != p._2).distinct
      val got = TextOps.nearDupComponents(
          (0 until n).map(_.toLong).toDF("id"), "id",
          pairs.toDF("id_a", "id_b"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == ufComponents(n, pairs), s"trial $trial (n=$n)")
    }
    // adversarial chain 0-1-2-...-999: diameter 999 must converge within
    // the default round budget (pointer doubling ⇒ O(log D) rounds; the
    // plain propagation loop would need ~1000)
    val chainN = 1000
    val chain = (0 until chainN - 1).map(i => (i.toLong, i.toLong + 1))
    val labels = TextOps.nearDupComponents(
        (0 until chainN).map(_.toLong).toDF("id"), "id",
        chain.toDF("id_a", "id_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(labels.forall(_._2 == 0L), "chain did not fully contract to 0")
  }

  test("real image decode: PNG round-trip recovers the exact generator " +
    "pixels; garbage payloads degrade to None, distributed path agrees") {
    // lossless round-trip: decode(syntheticPng(id)) == the formula
    for (id <- Seq(0L, 1L, 7L, 255L, 1000000L)) {
      val Some((w, h, sum)) = Multimodal.decodeImage(Multimodal.syntheticPng(id))
      val expected = (for (y <- 0 until 8; x <- 0 until 8)
        yield (id * 31 + x * 7 + y * 13) % 256).sum
      assert(w == 8 && h == 8 && sum == expected, s"id=$id")
    }
    // non-square dims decode true width/height, not stub arithmetic
    val Some((w2, h2, _)) = Multimodal.decodeImage(
      Multimodal.syntheticPng(3L, w = 5, h = 11))
    assert(w2 == 5 && h2 == 11)
    // every base-JDK lossless format decodes through the same path with
    // identical pixels (BMP and GIF writers ship with javax.imageio)
    for (fmt <- Seq("bmp", "gif")) {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(Multimodal.syntheticPng(9L)))
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, fmt, bos), s"no $fmt writer")
      val Some((wf, hf, sumF)) = Multimodal.decodeImage(bos.toByteArray)
      val expected9 = (for (y <- 0 until 8; x <- 0 until 8)
        yield (9L * 31 + x * 7 + y * 13) % 256).sum
      assert(wf == 8 && hf == 8 && sumF == expected9, s"fmt=$fmt")
    }
    // corrupt media degrades to a dropped row, never a task failure
    assert(Multimodal.decodeImage("not a png".getBytes).isEmpty)
    assert(Multimodal.decodeImage(Array.emptyByteArray).isEmpty)
    // distributed: decodeImages drops the corrupt row, keeps the rest
    val sp = spark
    import sp.implicits._
    val media = Seq(
      (1L, Multimodal.syntheticPng(1L)),
      (2L, "garbage".getBytes),
      (3L, Multimodal.syntheticPng(3L))).toDF("media_id", "payload")
    val out = Multimodal.decodeImages(spark, media).collect()
      .map(f => f.media_id -> f.px_sum).toMap
    assert(out.keySet == Set(1L, 3L))
    val exp1 = (for (y <- 0 until 8; x <- 0 until 8)
      yield (31 + x * 7 + y * 13) % 256).sum
    assert(out(1L) == exp1)
  }

  test("real audio decode: WAV/PCM16 round-trip recovers the exact " +
    "generator samples; malformed RIFF degrades to None, distributed " +
    "path agrees") {
    // lossless round-trip: decode(syntheticWav(id)) == the formula
    for (id <- Seq(0L, 1L, 31L, 255L, 1000000L)) {
      val Some((rate, n, absSum, maxAbs)) =
        Multimodal.decodeWav(Multimodal.syntheticWav(id))
      val expectedN = 32 + (id % 32)
      val samples = (0L until expectedN)
        .map(i => math.abs((id * 131 + i * 31) % 4001 - 2000))
      assert(rate == 8000 && n == expectedN, s"id=$id")
      assert(absSum == samples.sum && maxAbs == samples.max, s"id=$id")
    }
    // malformed containers degrade to dropped rows, never task failures
    assert(Multimodal.decodeWav("not a wav".getBytes).isEmpty)
    assert(Multimodal.decodeWav(Array.emptyByteArray).isEmpty)
    // truncated mid-header and mid-data
    val ok = Multimodal.syntheticWav(5L)
    assert(Multimodal.decodeWav(ok.take(10)).isEmpty)
    assert(Multimodal.decodeWav(ok.take(50)).isEmpty)
    // a PNG is not a WAV (cross-codec payloads must not misparse)
    assert(Multimodal.decodeWav(Multimodal.syntheticPng(1L)).isEmpty)
    // distributed: decodeAudios drops the corrupt row, keeps the rest
    val sp = spark
    import sp.implicits._
    val media = Seq(
      (1L, Multimodal.syntheticWav(1L)),
      (2L, "garbage".getBytes),
      (3L, Multimodal.syntheticWav(3L))).toDF("media_id", "payload")
    val out = Multimodal.decodeAudios(spark, media).collect()
      .map(f => f.media_id -> f.n_samples).toMap
    assert(out == Map(1L -> 33L, 3L -> 35L))
  }

  test("real video decode: motion-PNG AVI round-trip recovers the exact " +
    "per-frame generator pixels; real-JPEG MJPEG walks the same " +
    "container; malformed/cross-codec payloads degrade to None") {
    def expectedSum(id: Long, f: Int): Long =
      (for (y <- 0 until 8; x <- 0 until 8)
        yield (id * 31 + f * 17 + x * 7 + y * 13) % 256).sum
    // lossless round-trip at stride 1: every frame, exact pixels
    for (id <- Seq(0L, 1L, 7L, 255L, 1000000L)) {
      val Some(frames) = Multimodal.decodeAviFrames(Multimodal.syntheticAvi(id))
      val n = (2 + id % 3).toInt
      assert(frames.map(_.frame_idx) == (0 until n).toVector, s"id=$id")
      frames.foreach { fr =>
        assert(fr.width == 8 && fr.height == 8 &&
          fr.px_sum == expectedSum(id, fr.frame_idx), s"id=$id f=${fr.frame_idx}")
      }
    }
    // stride sampling picks exactly every stride-th frame index
    val Some(sampled) = Multimodal.decodeAviFrames(
      Multimodal.syntheticAvi(2L), stride = 2) // 4 frames → 0, 2
    assert(sampled.map(_.frame_idx) == Vector(0, 2))
    // REAL MJPEG: JPEG frames through the identical container walk
    // (JPEG is lossy — assert dimensions + frame count, not pixel sums)
    val jpegFrames = (0 until 3).map { f =>
      val img = new java.awt.image.BufferedImage(16, 12,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 12; x <- 0 until 16)
        img.setRGB(x, y, (f * 40 + x) << 16)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", bos)
      bos.toByteArray
    }
    val Some(mjpeg) = Multimodal.decodeAviFrames(
      Multimodal.buildAvi(jpegFrames, 16, 12))
    assert(mjpeg.size == 3 &&
      mjpeg.forall(f => f.width == 16 && f.height == 12))
    // malformed containers degrade, never task failures
    assert(Multimodal.decodeAviFrames("not an avi".getBytes).isEmpty)
    assert(Multimodal.decodeAviFrames(Array.emptyByteArray).isEmpty)
    val ok = Multimodal.syntheticAvi(5L)
    assert(Multimodal.decodeAviFrames(ok.take(10)).isEmpty)
    assert(Multimodal.decodeAviFrames(ok.take(200)).isEmpty) // mid-movi cut
    // cross-codec: a WAV is RIFF but not AVI; a bare PNG is not RIFF
    assert(Multimodal.decodeAviFrames(Multimodal.syntheticWav(1L)).isEmpty)
    assert(Multimodal.decodeAviFrames(Multimodal.syntheticPng(1L)).isEmpty)
    // a corrupt FRAME inside a valid AVI skips that frame, keeps the rest
    val mixed = Multimodal.buildAvi(
      Seq(jpegFrames.head, "corrupt frame bytes".getBytes, jpegFrames.last),
      16, 12)
    val Some(kept) = Multimodal.decodeAviFrames(mixed)
    assert(kept.map(_.frame_idx) == Vector(0, 2))
    // an AVI whose every frame is an undecodable codec payload (the
    // H.264 shape) yields None — the honest can't-decode signal
    assert(Multimodal.decodeAviFrames(
      Multimodal.buildAvi(Seq("h264 nal soup".getBytes), 8, 8)).isEmpty)
    // distributed: one row per sampled frame, corrupt payloads drop
    val sp = spark
    import sp.implicits._
    val media = Seq(
      (1L, Multimodal.syntheticAvi(1L)),
      (2L, "garbage".getBytes),
      (3L, Multimodal.syntheticAvi(3L))).toDF("media_id", "payload")
    val out = Multimodal.decodeVideoFrames(spark, media).collect()
    assert(out.map(_.media_id).toSet == Set(1L, 3L))
    // id=1 → 2 + 1%3 = 3 frames; id=3 → 2 + 0 = 2 frames
    assert(out.filter(_.media_id == 1L).map(_.frame_idx).sorted.toSeq ==
      (0 until 3) && out.filter(_.media_id == 3L).length == 2)
    out.foreach(r => assert(r.px_sum == expectedSum(r.media_id, r.frame_idx)))
  }

  test("multimodal resize: deterministic, schema-stable, length bounded") {
    val sp = spark
    import sp.implicits._
    val media = Seq((1L, "image", "abcdefghijklmnopqrstuvwxyz".getBytes),
      (2L, "image", Array.fill(5000)(7.toByte)))
      .toDF("media_id", "kind", "payload")
    val out = Multimodal.resize(spark, media, 640, 480).collect()
      .map(r => r.media_id -> r).toMap
    assert(out(1L).width == 640 && out(1L).height == 480)
    assert(out(1L).payload.toSeq ==
      Multimodal.resizeStub("abcdefghijklmnopqrstuvwxyz".getBytes, 640, 480).toSeq)
    assert(out(2L).payload.length <= 5000)
  }

  test("multimodal frame sampling: one row per sampled frame, pure crc") {
    val sp = spark
    import sp.implicits._
    val payload = Array.tabulate(1000)(i => (i % 251).toByte)
    val media = Seq((9L, "video", payload)).toDF("media_id", "kind", "payload")
    val frames = Multimodal.sampleFrames(spark, media, nFrames = 10, stride = 3)
      .collect().sortBy(_.frame_idx)
    assert(frames.map(_.frame_idx).toSeq == Seq(0, 3, 6, 9))
    assert(frames.forall(_.media_id == 9L))
    // pure: same payload → same crcs
    val again = Multimodal.sampleFrames(spark, media, 10, 3)
      .collect().sortBy(_.frame_idx)
    assert(frames.map(_.frame_crc).toSeq == again.map(_.frame_crc).toSeq)
  }
}
