package graft.pipeline

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Correctness of the training-data pipeline ops that the DuckDB oracle
  * cannot replay (hash functions aren't portable): sketches verified
  * against their exact baselines; multimodal plumbing verified against
  * the stub's pure function. */
class PipelineSpec extends AnyFunSuite with SparkTestBase {

  private val dir = "/root/testdata/sf0.001"
  private lazy val docs = spark.read.parquet(s"$dir/documents.parquet")
  private lazy val emb = spark.read.parquet(s"$dir/embeddings.parquet")

  test("minhash LSH finds planted near-dups and every reported pair is " +
    "verified-exact") {
    import spark.implicits._
    // plant near-duplicates: same text + one appended token (jaccard ≈ 0.95)
    val planted = docs.limit(40).select(
        (col("doc_id") + 100000L).as("doc_id"),
        concat(col("text"), lit(" plantedextra")).as("text"))
    val corpus = docs.select("doc_id", "text").unionByName(planted)
    val lsh = TextOps.minhashLsh(corpus, "doc_id", "text",
      n = 3, k = 16, bands = 16, verifyThreshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // all 40 planted pairs recovered (at j≈0.95, P(miss) ≈ (1-0.95)^16 ≈ 0)
    val plantedPairs = (0 until 40).map(i => (i.toLong, i + 100000L)).toSet
    val found = lsh.map(p => (p._1, p._2)).toSet
    assert(plantedPairs.subsetOf(found),
      s"missing ${plantedPairs -- found}")
    // and each reported jaccard equals the exact computation
    val exact = TextOps.ngramJaccardPairs(corpus, "doc_id", "text", 3, 0.5)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    lsh.foreach { case (a, b, j) =>
      assert(exact.get((a, b)).contains(j), s"pair ($a,$b)")
    }
  }

  test("minhash signature similarity approximates exact jaccard") {
    val sigs = TextOps.minhashSignatures(docs.limit(50), "doc_id", "text", 3, 128)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val exact = TextOps.ngramJaccardPairs(docs.limit(50), "doc_id", "text", 3, 0.0)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val errs = exact.toSeq.map { case ((a, b), j) =>
      val est = sigs(a).zip(sigs(b)).count { case (x, y) => x == y } / 128.0
      math.abs(est - j)
    }
    assert(errs.nonEmpty && errs.sum / errs.size < 0.08,
      s"mean |minhash - jaccard| = ${errs.sum / errs.size}")
  }

  test("simhash: identical docs get identical hashes; near-identical docs " +
    "get small hamming distance") {
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog and runs far away today"
    val twins = Seq((1L, base), (2L, base),
      (3L, base.replace("today", "tomorrow")),
      (4L, "completely different words entirely unrelated content here now then")
    ).toDF("doc_id", "text")
    val hs = TextOps.simhash64(twins, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hs(1L) == hs(2L))
    assert(java.lang.Long.bitCount(hs(1L) ^ hs(3L)) <= 16)
    assert(java.lang.Long.bitCount(hs(1L) ^ hs(4L)) >
      java.lang.Long.bitCount(hs(1L) ^ hs(3L)))
  }

  test("simhashPairs finds the planted near-duplicate via chunk buckets") {
    import spark.implicits._
    val base = (1 to 30).map(i => s"w$i").mkString(" ")
    val planted = Seq((1L, base), (2L, base + " extra"),
      (3L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"))
      .toDF("doc_id", "text")
    val pairs = TextOps.simhashPairs(planted, "doc_id", "text", maxDist = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.contains((1L, 3L)))
  }

  test("ANN LSH top-k ≈ brute-force cosine top-k (high recall, exact " +
    "scores on the overlap)") {
    val q = emb.where(col("vec_id") === 0).select("embedding").head().getSeq[Float](0)
    val brute = VectorOps.cosineTopK(emb, "vec_id", "embedding", q, 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1))
    val ann = VectorOps.annTopK(emb, "vec_id", "embedding", q, 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(brute.head._1 == 0L && brute.head._2 == 1.0) // self first
    val overlap = brute.count { case (id, c) => ann.get(id).contains(c) }
    assert(overlap >= 5, s"ANN recall@10 too low: $overlap/10")
    // ann results carry exact cosines for whatever it returns
    val bruteAll = VectorOps.cosineTopK(emb, "vec_id", "embedding", q, 500)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    ann.foreach { case (id, c) => assert(bruteAll(id) == c) }
  }

  test("multimodal feature extraction matches the stub applied directly") {
    val feats = Multimodal.extractFeatures(spark,
        Multimodal.asMedia(docs.limit(20), "doc_id", "text"))
      .collect().map(f => f.media_id -> f).toMap
    docs.limit(20).collect().foreach { r =>
      val id = r.getLong(r.fieldIndex("doc_id"))
      val text = r.getString(r.fieldIndex("text"))
      val bytes = text.getBytes("UTF-8")
      val (w, h, sum, crc) = Multimodal.decodeImageStub(bytes)
      val f = feats(id)
      assert(f.n_bytes == bytes.length && f.byte_sum == sum &&
        f.head_crc == crc && f.width == w && f.height == h)
      assert(f.kind == (if (id % 2 == 0) "image" else "audio"))
    }
  }

  test("dedup exact: planted duplicate collapses to the smallest id") {
    import spark.implicits._
    val d = Seq((10L, "same text"), (7L, "same text"), (3L, "other"))
      .toDF("doc_id", "text")
    val out = TextOps.dedupExact(d, "doc_id", "text")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.length == 2)
    val dup = out.find(_._3 == 2L).get
    assert(dup._2 == 7L)
  }
}
