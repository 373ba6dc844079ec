package graft.query

import graft.analysis.{SynonymDict, Tokenizer}
import graft.functions.graftFunctions._
import graft.index.IndexStore
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** BM25 top-k query engine over the term-partitioned compressed index
  * (SURVEY.md §2.4, §3.2).
  *
  * Reference semantics reproduced (cites into
  * `/root/reference/LuceneSearchEngine/src/Searcher.java`):
  *  - Lucene 6.3 default BM25 (k1=1.2, b=0.75), version pin :106;
  *    `idf = ln(1 + (N − df + 0.5)/(df + 0.5))`,
  *    `w = idf · tf·(k1+1)/(tf + k1·(1−b+b·dl/avgdl))`
  *  - filter clause matches but does not score (Q1, :727-744) — the
  *    filter is applied to the docstore side, never enters the score
  *  - null/empty query → MatchNoDocs (Q2, :742)
  *  - top-k by (score desc, docId asc) (Q3, :779-787) —
  *    `orderBy(...).limit(k)` plans TakeOrderedAndProject = per-partition
  *    bounded heap + driver merge, the collector architecture itself
  *  - sort-by-field / docid-order / set-only modes (Q6/Q7/Q8, :788-820)
  *  - pagination via start+rows clamp then slice (Q11, :760-766,852-854)
  *  - hit metadata: totalHits, maxScore (Q12, :836-882)
  *
  * Rank-identical floats: per-doc score is the fold of per-term
  * contributions sorted by term (sort_array before aggregate), so the
  * double summation order is fixed — identical to the golden model's —
  * regardless of partitioning (SURVEY.md §7 hard-part 2).
  *
  * Deletes/upserts: older doc versions and tombstoned urls form the
  * "dead docs" set (Lucene liveDocs analog), anti-joined before scoring.
  * Collection statistics deliberately include dead docs until [[
  * graft.index.IndexBuilder.merge]] — exactly Lucene's behavior for
  * deleted-but-unmerged docs.
  */
final class Searcher(
    val spark: SparkSession,
    val root: String,
    dict: SynonymDict = SynonymDict.empty,
    k1: Double = 1.2,
    b: Double = 0.75) extends AutoCloseable {

  import spark.implicits._

  val snapshot: IndexStore.Snapshot =
    IndexStore.readLatestSnapshot(spark, root)
      .getOrElse(sys.error(s"no snapshot at $root"))

  private def unionSegs(path: String => String): DataFrame =
    snapshot.segments.map(s => spark.read.parquet(path(s))).reduce(_ unionByName _)

  /** Row store (S8): doc_id, url, warc_ts, lang, text, dl. */
  val docstore: DataFrame =
    unionSegs(IndexStore.docstorePath(root, _)).persist(StorageLevel.MEMORY_AND_DISK)

  val postings: DataFrame = unionSegs(IndexStore.postingsPath(root, _))

  /** Global per-term df across segments (term_stats is per segment). */
  val termStats: DataFrame =
    unionSegs(IndexStore.termStatsPath(root, _))
      .groupBy("term").agg(sum("df").as("df"), sum("ttf").as("ttf"))
      .persist(StorageLevel.MEMORY_AND_DISK)

  /** Collection statistics (S10): N, avgdl over all segments. */
  val (docCount: Long, avgdl: Double) = {
    val r = unionSegs(IndexStore.statsPath(root, _))
      .agg(sum("doc_count"), sum("sum_dl")).head()
    val n = if (r.isNullAt(0)) 0L else r.getLong(0)
    val s = if (r.isNullAt(1)) 0L else r.getLong(1)
    (n, if (n == 0) 0.0 else s.toDouble / n)
  }

  /** Lucene-liveDocs analog: doc_ids superseded by a newer version of the
    * same url (upsert) or tombstoned (delete). Usually small; broadcast
    * into an anti-join on the match path. */
  val deadDocs: DataFrame = {
    val w = Window.partitionBy("url")
      .orderBy(col("warc_ts").desc, col("doc_id").desc)
    val superseded =
      if (snapshot.segments.size == 1) spark.emptyDataset[Long].toDF("doc_id")
      else docstore.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") > 1).select("doc_id")
    val tombs = IndexStore.readTombstones(spark, root, snapshot.tombstones)
    val deleted =
      if (tombs.isEmpty) spark.emptyDataset[Long].toDF("doc_id")
      else docstore.join(broadcast(tombs.toDF("url")), Seq("url"), "left_semi")
        .select("doc_id")
    superseded.union(deleted).distinct().persist(StorageLevel.MEMORY_AND_DISK)
  }
  private lazy val hasDeadDocs: Boolean = !deadDocs.isEmpty

  val maxDoc: Long = docCount
  def numDocs: Long = docCount - deadDocs.count() // S9: live doc count

  /** Query analysis = the index-time chain (tokenize → uppercase →
    * synonym expand) + dedup; term order fixed by sort for the
    * deterministic score fold. Duplicate query terms collapse (documented
    * simplification; golden model shares this contract). */
  def analyzeQuery(query: String): Seq[String] =
    if (query == null) Seq.empty
    else dict.expand(Tokenizer.tokenize(query).toIndexedSeq).distinct.sorted

  /** Per-term idf over terms present in the index: driver-side from the
    * (tiny) filtered term_stats — the broadcast of collection stats the
    * reference reads per query (Searcher.java:722-725). */
  private def termIdfs(terms: Seq[String]): Seq[(String, Long, Double)] =
    if (terms.isEmpty) Seq.empty
    else termStats.filter(col("term").isin(terms: _*))
      .select("term", "df").as[(String, Long)].collect().toSeq
      .map { case (t, df) =>
        (t, df, math.log(1.0 + (docCount - df + 0.5) / (df + 0.5)))
      }

  /** Match + score: returns (doc_id, matched, score). The posting scan is
    * a literal `term IN (...)` filter, so Parquet row-group pruning (term
    * is the sort key within each part) skips everything else; blobs
    * decode via the codegen'd vb_decode expression. */
  private def scoredMatches(terms: Seq[String],
                            filter: Option[Column]): DataFrame = {
    if (terms.isEmpty || docCount == 0)
      return spark.emptyDataset[(Long, Int, Double)]
        .toDF("doc_id", "matched", "score")
    val idfs = termIdfs(terms)
    if (idfs.isEmpty)
      return spark.emptyDataset[(Long, Int, Double)]
        .toDF("doc_id", "matched", "score")

    val idfDf = idfs.map { case (t, _, idf) => (t, idf) }.toDF("term", "idf")

    val decoded = postings
      .filter(col("term").isin(idfs.map(_._1): _*))
      .select(col("term"), explode(vb_decode(col("blob"))).as("p"))
      .select(col("term"), col("p.doc_id").as("doc_id"), col("p.tf").as("tf"))
      .join(broadcast(idfDf), Seq("term"))

    // non-scoring FILTER clause (Q1): restrict the docstore side first so
    // the predicate pushes into the parquet scan and never touches scores
    val docSide0 = docstore.select(col("doc_id"), col("dl"),
      col("lang"), col("url"))
    val docSide = filter.map(docSide0.where).getOrElse(docSide0)
      .select("doc_id", "dl")

    val withDl = decoded.join(docSide, Seq("doc_id"))
    val alive =
      if (hasDeadDocs) withDl.join(broadcast(deadDocs), Seq("doc_id"), "left_anti")
      else withDl

    val contrib = col("idf") * (col("tf") * lit(k1 + 1.0)) /
      (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / lit(avgdl)))

    alive
      .withColumn("contrib", contrib)
      .groupBy("doc_id")
      .agg(count(lit(1)).cast("int").as("matched"),
        sort_array(collect_list(struct(col("term"), col("contrib")))).as("__parts"))
      .withColumn("score",
        aggregate(col("__parts"), lit(0.0d), (acc, x) => acc + x("contrib")))
      .select("doc_id", "matched", "score")
  }

  /** Conjunctive (AND, Q5) or disjunctive (OR) match set with scores.
    * AND with any zero-df term ⇒ MatchNoDocs (BooleanQuery MUST). */
  def score(query: String, conjunctive: Boolean = true,
            filter: Option[Column] = None): DataFrame = {
    val terms = analyzeQuery(query)
    val scored = scoredMatches(terms, filter)
    if (conjunctive) {
      val present = termIdfs(terms).size
      if (present < terms.size) scored.where(lit(false))
      else scored.filter(col("matched") === terms.size)
    } else scored
  }

  /** Flagship: BM25 top-k with pagination (Q3 + Q11) — fetch-after-rank
    * joins stored fields only for the returned page (S8). */
  def search(query: String, k: Int, start: Int = 0,
             conjunctive: Boolean = true,
             filter: Option[Column] = None): DataFrame = {
    val topk = score(query, conjunctive, filter)
      .orderBy(col("score").desc, col("doc_id").asc)
      .offset(start).limit(k)
    topk.join(docstore, Seq("doc_id"))
      .select("doc_id", "score", "url", "warc_ts", "lang", "text")
      .orderBy(col("score").desc, col("doc_id").asc)
  }

  /** Hit metadata (Q12): totalHits, maxScore alongside the page. */
  final case class Meta(total: Long, maxScore: Double)
  def searchWithMeta(query: String, k: Int, start: Int = 0,
                     conjunctive: Boolean = true,
                     filter: Option[Column] = None): (DataFrame, Meta) = {
    val scored = score(query, conjunctive, filter).persist()
    val m = scored.agg(count(lit(1)), max("score")).head()
    val meta = Meta(m.getLong(0), if (m.isNullAt(1)) 0.0 else m.getDouble(1))
    val page = scored.orderBy(col("score").desc, col("doc_id").asc)
      .offset(start).limit(k)
      .join(docstore, Seq("doc_id"))
      .select("doc_id", "score", "url", "warc_ts", "lang", "text")
      .orderBy(col("score").desc, col("doc_id").asc)
    (page, meta)
  }

  /** Sort-by-field top-k (Q6): matches ordered by arbitrary docstore
    * columns, doc_id tie-break, `fillFields` ⇒ sort columns stay in the
    * output (Searcher.java:861-871). */
  def searchSortByField(query: String, sortCols: Seq[Column], k: Int,
                        start: Int = 0, conjunctive: Boolean = true,
                        filter: Option[Column] = None): DataFrame = {
    val matches = score(query, conjunctive, filter).select("doc_id")
    matches.join(docstore, Seq("doc_id"))
      .orderBy(sortCols :+ col("doc_id").asc: _*)
      .offset(start).limit(k)
  }

  /** Full match set in docID order, no scores (Q7, TOPDOCSONLY). */
  def matchesInDocIdOrder(query: String, conjunctive: Boolean = true,
                          filter: Option[Column] = None): DataFrame =
    score(query, conjunctive, filter).select("doc_id").orderBy("doc_id")

  /** Complete match docset (Q8, SETONLY) — feeds facets. */
  def matchSet(query: String, conjunctive: Boolean = true,
               filter: Option[Column] = None): DataFrame =
    score(query, conjunctive, filter).select("doc_id")

  /** Stored-field fetch by docID (S8). */
  def doc(docIds: Seq[Long]): DataFrame =
    docstore.filter(col("doc_id").isin(docIds: _*))

  override def close(): Unit = {
    docstore.unpersist()
    termStats.unpersist()
    deadDocs.unpersist()
  }
}
