package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`ARRAY<FLOAT>`).
  *
  * Brute-force cosine top-k is the exact baseline (one scan, no shuffle
  * before the top-k heap merge — `orderBy(...).limit(k)` plans
  * TakeOrderedAndProject); the LSH-bucketed variant is the 100 TB path:
  * random-hyperplane signatures computed per row (shuffle-free), then a
  * bucket-equijoin restricts candidate pairs.
  *
  * The nearest analog in the reference is the image-similarity re-rank
  * over a match set (`/root/reference/LuceneSearchEngine/src/
  * Searcher.java:963-1069`, SURVEY.md Q15): [[rerankByCosine]] is exactly
  * that shape — re-order an existing candidate set by vector similarity.
  */
object VectorOps {

  /** Elementwise dot product of two double-array columns, folded in index
    * order (deterministic summation). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, x) => acc + x)

  private def toDouble(c: Column): Column = transform(c, x => x.cast("double"))

  /** Cosine similarity between two float-vector columns: the native
    * one-pass [[graft.functions.VecCosineExpr]] (dp, |a|², |b|²
    * accumulated in index order — value-identical to the HOF fold
    * formulation, ~80× faster per pair because it stays inside
    * whole-stage codegen instead of interpreting a lambda tree). */
  def cosine(a: Column, b: Column): Column =
    graft.functions.graftFunctions.vec_cosine(a, b)

  /** Exact top-k nearest by cosine to a literal query vector. */
  def cosineTopK(embeddings: DataFrame, idCol: String, vecCol: String,
                 query: Seq[Float], k: Int, roundTo: Int = 4): DataFrame = {
    val q = typedLit(query.map(_.toDouble))
    embeddings
      .withColumn("cosine", round(cosine(toDouble(col(vecCol)), q), roundTo))
      .orderBy(col("cosine").desc, col(idCol).asc)
      .select(col(idCol), col("cosine"))
      .limit(k)
  }

  /** Re-rank an existing candidate set (doc ids) by cosine to the query —
    * the reference's image re-rank shape (Q15). */
  def rerankByCosine(candidates: DataFrame, embeddings: DataFrame,
                     idCol: String, vecCol: String, query: Seq[Float],
                     k: Int): DataFrame =
    cosineTopK(embeddings.join(candidates, Seq(idCol), "left_semi"),
      idCol, vecCol, query, k)

  /** Deterministic random hyperplanes (seeded) for sign-LSH. */
  def hyperplanes(seed: Long, nPlanes: Int, dim: Int): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(nPlanes)(Array.fill(dim)(rnd.nextGaussian()))
  }

  /** Sign-LSH bucket id per row: bit i = sign(v · plane_i). Per-row, no
    * shuffle — at 100 TB this is a map-only pass. */
  def lshBucket(vecCol: Column, planes: Array[Array[Double]]): Column = {
    val v = toDouble(vecCol)
    planes.zipWithIndex.map { case (p, i) =>
      when(dot(v, typedLit(p.toSeq)) >= 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** One sign-LSH bucket per SEED (`ARRAY<LONG>`), folded over a literal
    * seeds×planes×dim array in a single compact HOF tree — seeds·planes
    * separate dot projections codegen into a method too large to JIT
    * well (measured: ~6 s of cold planning at 8×4). The bucket id is the
    * plane-sign vector folded as `acc·2 + bit`; any injective map of the
    * sign vector yields the identical bucketing, so candidates (and the
    * oracle's) are unchanged. */
  def lshBucketsPerSeed(vecCol: Column,
                        planesBySeed: Seq[Array[Array[Double]]]): Column =
    // native codegen loop ([[graft.functions.VecLshBucketsExpr]]) — the
    // previous transform/aggregate HOF tree interpreted seeds×planes×dim
    // lambda evaluations per row; arithmetic identical (per seed,
    // acc·2 + sign bit, each dot an index-ordered Σ x·y from 0.0), so
    // the oracle's inlined-constants replay is unaffected
    graft.functions.graftFunctions.vec_lsh_buckets(toDouble(vecCol),
      planesBySeed.toArray)

  /** Embedding-cosine near-duplicate pairs ≥ threshold — the vector leg
    * of the dedup family. `nPlanes = 0` is the exact all-pairs baseline
    * (test-only: O(n²), never the scale path). With `nPlanes > 0` each
    * row gets one sign-LSH bucket per seed (map-only), candidate pairs
    * are the bucket-local joins unioned across seeds (multiple seeds buy
    * recall: a pair is a candidate if ALL planes of ANY seed agree), and
    * only the deduped candidates are verified with exact cosine. Pair
    * work is bucket-local, so it scales with Σ bucket², not corpus²;
    * recall vs the exact baseline is pinned in tests, and the whole
    * pipeline (deterministic seeded planes) is SQL-replayable by the
    * DuckDB oracle. */
  def cosineNearDupPairs(embeddings: DataFrame, idCol: String, vecCol: String,
                         threshold: Double, seeds: Seq[Long] = Seq(42L),
                         nPlanes: Int = 0, dim: Int = 64,
                         roundTo: Int = 4): DataFrame = {
    val candidates =
      if (nPlanes == 0) {
        val a = embeddings.select(col(idCol).as("id_a"))
        val b = embeddings.select(col(idCol).as("id_b"))
        a.crossJoin(b).where(col("id_a") < col("id_b"))
      } else {
        val planesBySeed = seeds.map(s => hyperplanes(s, nPlanes, dim))
        val bucketed = embeddings.select(col(idCol),
            posexplode(lshBucketsPerSeed(col(vecCol), planesBySeed)))
          .toDF(idCol, "sid", "bucket")
        val a = bucketed.select(col(idCol).as("id_a"), col("sid"), col("bucket"))
        val b = bucketed.select(col(idCol).as("id_b"), col("sid"), col("bucket"))
        a.join(b, Seq("sid", "bucket")).where(col("id_a") < col("id_b"))
          .select("id_a", "id_b").distinct()
      }
    val va = embeddings.select(col(idCol).as("id_a"), col(vecCol).as("va"))
    val vb = embeddings.select(col(idCol).as("id_b"), col(vecCol).as("vb"))
    candidates.join(va, Seq("id_a")).join(vb, Seq("id_b"))
      .withColumn("cosine", round(cosine(col("va"), col("vb")), roundTo))
      .where(col("cosine") >= threshold)
      .select("id_a", "id_b", "cosine")
  }

  /** IVF (inverted-file) coarse quantizer: k-means centroids trained
    * with Lloyd's iterations where each step is ONE distributed
    * aggregation (`groupBy(nearest centroid).avg`) — no data leaves the
    * executors, only k×dim centroid sums. Deterministic: seeded init from
    * the first k distinct rows by id.
    *
    * TRAIN-ON-SAMPLE is the API default, not a caller convention: the
    * quantizer trains on the first `maxTrainRows` rows by id (a
    * deterministic, oracle-replayable prefix — ORDER BY id LIMIT n), so
    * at 100 TB the Lloyd iterations aggregate a bounded frame while
    * assignment ([[ivfTopK]]) stays a map-only pass over everything.
    * Coarse-quantizer quality needs only a representative sample, not
    * the corpus (recall-vs-exact verified on the sample path in
    * PipelineExtrasSpec). */
  def trainIvfCentroids(embeddings: DataFrame, idCol: String, vecCol: String,
                        k: Int, iters: Int = 5,
                        seed: Long = 42L,
                        maxTrainRows: Int = 200000): Array[Array[Double]] = {
    require(maxTrainRows >= k, s"maxTrainRows=$maxTrainRows < k=$k")
    val train = embeddings.orderBy(col(idCol)).limit(maxTrainRows)
      .select(col(idCol), col(vecCol))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      trainLloyd(train, idCol, vecCol, k, iters)
    } finally { train.unpersist(); () }
  }

  private def trainLloyd(train: DataFrame, idCol: String, vecCol: String,
                         k: Int, iters: Int): Array[Array[Double]] = {
    val first = train.orderBy(col(idCol)).limit(k)
      .select(vecCol).collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    var centroids = first
    var it = 0
    while (it < iters) {
      val assigned = train
        .withColumn("c", nearestCentroid(col(vecCol), centroids))
        .select(col("c"), toDouble(col(vecCol)).as("v"))
      val sums = assigned.groupBy("c")
        .agg(count(lit(1)).as("n"),
          array((0 until centroids(0).length).map(i =>
            sum(element_at(col("v"), i + 1))): _*).as("s"))
        .collect()
      val next = centroids.clone()
      sums.foreach { r =>
        val c = r.getInt(0)
        val n = r.getLong(1).toDouble
        next(c) = r.getSeq[Double](2).map(_ / n).toArray
      }
      centroids = next
      it += 1
    }
    centroids
  }

  /** Index of the nearest centroid by squared L2 (map-only expression).
    * Native codegen loop ([[graft.functions.VecNearestCentroidExpr]]):
    * the previous k × dim `aggregate(zip_with(...))` HOF tree evaluated
    * interpreted lambdas per element — same arithmetic (index-ordered
    * Σ(x−y)² from 0.0, strict-`<` argmin, first minimum wins), orders of
    * magnitude less per-row cost. */
  def nearestCentroid(vecCol: Column, centroids: Array[Array[Double]]): Column =
    graft.functions.graftFunctions.vec_nearest_centroid(toDouble(vecCol),
      centroids)

  /** IVF ANN top-k: assign every row to its nearest centroid (map-only),
    * probe only the `nprobe` centroids closest to the query, exact cosine
    * within the probed cells. The standard coarse-quantization scale path
    * next to [[annTopK]]'s sign-LSH; recall vs exact verified in tests. */
  def ivfTopK(embeddings: DataFrame, idCol: String, vecCol: String,
              query: Seq[Float], k: Int,
              centroids: Array[Array[Double]], nprobe: Int = 2,
              roundTo: Int = 4): DataFrame = {
    val qv = query.map(_.toDouble).toArray
    def d2(c: Array[Double]): Double =
      c.zip(qv).map { case (a, b) => (a - b) * (a - b) }.sum
    val probes = centroids.zipWithIndex.sortBy(p => d2(p._1))
      .take(nprobe).map(_._2).toSeq
    val cells = embeddings
      .withColumn("c", nearestCentroid(col(vecCol), centroids))
      .where(col("c").isin(probes: _*))
    cosineTopK(cells, idCol, vecCol, query, k, roundTo)
  }

  /** ANN top-k: probe only the query's LSH bucket (plus optional
    * neighboring buckets by Hamming-1 flips), then exact cosine within
    * the candidates. Recall traded for a candidate set ~2^-nPlanes of the
    * corpus; verified against [[cosineTopK]] in tests. */
  def annTopK(embeddings: DataFrame, idCol: String, vecCol: String,
              query: Seq[Float], k: Int, seed: Long = 42L, nPlanes: Int = 4,
              probeHamming1: Boolean = true, roundTo: Int = 4): DataFrame = {
    val dim = query.size
    val planes = hyperplanes(seed, nPlanes, dim)
    val qv = query.map(_.toDouble).toArray
    val qBucket = planes.zipWithIndex.map { case (p, i) =>
      val d = p.zip(qv).map { case (a, b) => a * b }.sum
      if (d >= 0) 1L << i else 0L
    }.sum
    val probes: Seq[Long] =
      if (!probeHamming1) Seq(qBucket)
      else qBucket +: (0 until nPlanes).map(i => qBucket ^ (1L << i))
    val bucketed = embeddings.withColumn("bucket", lshBucket(col(vecCol), planes))
    cosineTopK(bucketed.where(col("bucket").isin(probes: _*)),
      idCol, vecCol, query, k, roundTo)
  }
}
