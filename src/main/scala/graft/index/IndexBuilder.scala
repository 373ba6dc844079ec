package graft.index

import java.sql.Timestamp

import graft.analysis.SynonymDict
import graft.codec.VarByte
import graft.functions.graftFunctions._
import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed inverted-index build (SURVEY.md §3.1, §7 steps 3-5).
  *
  * Reference shape mirrored: schema-driven per-row indexing with PK
  * upserts (`/root/reference/LuceneSearchEngine/src/Indexer.java:233-435`)
  * becomes one declarative Spark job:
  *
  * {{{
  *   pages → latest-wins by url → coalesce(text, extract_text(html))
  *         → qube_tokenize → syn_expand → deterministic doc_id assignment
  *         → docstore
  *   tokens → explode → groupBy(doc_id, term).count           (tf)
  *          → term_stats (df, total tf)
  *          → skew-aware salting of head terms (Zipf head → saltFanout
  *            shards) → repartition(part) → sortWithinPartitions(part,
  *            term, doc_id) → single-pass mapPartitions run-length encode
  *            → postings(part, term, df_local, max_tf, min_dl, blob)
  * }}}
  *
  * The mapPartitions encode after the sort is the Spark-native analog of
  * Lucene's segment write: postings arrive (term, doc_id)-sorted, so
  * delta+varbyte compression is a single streaming pass with no
  * collect_list buffering and no extra shuffle.
  */
object IndexBuilder {

  final case class IndexConfig(
      numParts: Int = 32,         // posting hash-partition count (term space)
      rangeParts: Int = 32,       // docstore range partitions for id assignment
      blockSize: Int = VarByte.DefaultBlockSize,
      saltDf: Long = 10000,       // df ≥ threshold ⇒ head term, gets salted
      saltFanout: Int = 8,        // shards per head term
      maxSaltedTerms: Int = 10000)

  final case class Analyzed(url: String, warc_ts: Timestamp, lang: String,
                            text: String, tokens: Seq[String])
  final case class DocRow(doc_id: Long, url: String, warc_ts: Timestamp,
                          lang: String, text: String, tokens: Seq[String])
  final case class PostingRow(part: Int, term: String, df_local: Long,
                              max_tf: Int, min_dl: Int, blob: Array[Byte])

  final case class BuildReport(segment: String, docCount: Long, termCount: Long,
                               postingRows: Long, wallMs: Long)

  /** Latest-wins PK dedup (reference upsert semantics, S4:
    * `updateDocument(new Term(pk, value), doc)` Indexer.java:375-384):
    * newest `warc_ts` per `url` survives; ties broken arbitrarily-but-
    * deterministically by text. */
  def latestWins(pages: DataFrame): DataFrame = {
    val w = Window.partitionBy("url")
      .orderBy(col("warc_ts").desc, col("text").desc_nulls_last)
    pages.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  /** Analysis chain over the hinted page schema: byte-identical text per
    * url (pre-extracted `text` reused when present, else
    * `extract_text(html)`), then tokenize + synonym expansion. */
  def analyze(spark: SparkSession, pages: DataFrame,
              dict: SynonymDict): Dataset[Analyzed] = {
    import spark.implicits._
    val bcDict = spark.sparkContext.broadcast(dict)
    val synExpand = udf { tokens: Seq[String] =>
      bcDict.value.expand(tokens.toIndexedSeq)
    }
    pages
      .withColumn("__text", coalesce(col("text"), extract_text(col("html"))))
      .withColumn("__tokens",
        if (dict.isEmpty) qube_tokenize(col("__text"))
        else synExpand(qube_tokenize(col("__text"))))
      .select(col("url"), col("warc_ts"), col("lang"),
        col("__text").as("text"), col("__tokens").as("tokens"))
      .as[Analyzed]
  }

  /** Deterministic dense doc_id assignment: global sort by url (range
    * partition + in-partition sort), per-partition counts → cumulative
    * offsets, then a single mapPartitions pass. Scale-safe (never
    * collapses to one partition the way `row_number().over(orderBy)`
    * would) and independent of parallelism: ids depend only on the total
    * url order. */
  def assignDocIds(spark: SparkSession, analyzed: Dataset[Analyzed],
                   baseDocId: Long, rangeParts: Int): Dataset[DocRow] = {
    import spark.implicits._
    if (analyzed.isEmpty) return spark.emptyDataset[DocRow]
    val sorted = analyzed
      .repartitionByRange(rangeParts, col("url"))
      .sortWithinPartitions("url")
      .persist()
    val counts = sorted.groupBy(spark_partition_id().as("pid")).count()
      .as[(Int, Long)].collect().sortBy(_._1)
    val offsets: Map[Int, Long] = {
      var acc = baseDocId
      counts.map { case (pid, n) => val o = pid -> acc; acc += n; o }.toMap
    }
    val bcOff = spark.sparkContext.broadcast(offsets)
    val out = sorted.mapPartitions { it =>
      var next = bcOff.value.getOrElse(TaskContext.getPartitionId(), 0L)
      it.map { a =>
        val d = DocRow(next, a.url, a.warc_ts, a.lang, a.text, a.tokens)
        next += 1
        d
      }
    }
    out
  }

  /** (doc_id, dl, term, tf) from the token arrays — partial (map-side)
    * aggregation is free via hash agg. `dl` (the BM25 field length) is
    * functionally dependent on doc_id and rides along so it can be
    * colocated into the posting blobs (norms-style; no docstore join at
    * query time). */
  def termFrequencies(docs: Dataset[DocRow]): DataFrame =
    docs.select(col("doc_id"), size(col("tokens")).cast("int").as("dl"),
        explode(col("tokens")).as("term"))
      .groupBy("term", "doc_id", "dl").agg(count(lit(1)).as("tf"))

  /** Build one complete segment under `root/segments/<seg>` and return
    * its report. `resume = true` skips posting partitions already present
    * in the manifest (per-partition checkpoint/restart). */
  def buildSegment(spark: SparkSession, pages: DataFrame, dict: SynonymDict,
                   root: String, seg: String, baseDocId: Long,
                   cfg: IndexConfig = IndexConfig(),
                   inputSnapshot: String = "",
                   resume: Boolean = false): BuildReport = {
    import spark.implicits._
    val t0 = System.nanoTime()

    val docs = assignDocIds(spark, analyze(spark, latestWins(pages), dict),
      baseDocId, cfg.rangeParts).persist()

    // docstore: row store for stored-field fetch (S8) + dl for BM25
    docs.select(col("doc_id"), col("url"), col("warc_ts"), col("lang"),
        col("text"), size(col("tokens")).cast("int").as("dl"))
      .write.mode("overwrite").parquet(IndexStore.docstorePath(root, seg))

    val tf = termFrequencies(docs).persist()

    // collection + per-term statistics (S10): df = docs containing term,
    // ttf = total term frequency
    val termStats = tf.groupBy("term")
      .agg(count(lit(1)).as("df"), sum("tf").as("ttf"))
    termStats.write.mode("overwrite").parquet(IndexStore.termStatsPath(root, seg))

    val docCount = docs.count()
    val sumDl = docs.select(sum(size(col("tokens")))).as[Long].head()
    Seq((docCount, sumDl, if (docCount == 0) 0.0 else sumDl.toDouble / docCount))
      .toDF("doc_count", "sum_dl", "avgdl")
      .write.mode("overwrite").parquet(IndexStore.statsPath(root, seg))

    // --- skew handling: salt the Zipf head (SURVEY.md §7 risk 4) ---
    // head terms are known exactly from term_stats; each is split into
    // saltFanout shards by doc hash so no single posting partition holds
    // an entire head term's postings.
    val headTerms = spark.read.parquet(IndexStore.termStatsPath(root, seg))
      .filter(col("df") >= cfg.saltDf)
      .orderBy(col("df").desc).limit(cfg.maxSaltedTerms)
      .select(col("term"), lit(true).as("is_head"))

    val withPart = tf.join(broadcast(headTerms), Seq("term"), "left")
      .withColumn("salt",
        when(col("is_head"), pmod(xxhash64(col("doc_id")), lit(cfg.saltFanout.toLong)))
          .otherwise(lit(0L)))
      .withColumn("part",
        pmod(xxhash64(col("term")) + col("salt"), lit(cfg.numParts.toLong)).cast("int"))

    val done: Set[Int] =
      if (resume) IndexStore.completedParts(spark, root, seg) else Set.empty
    val pending = withPart.filter(!col("part").isin(done.toSeq: _*))

    val blockSize = cfg.blockSize
    val postings: Dataset[PostingRow] = pending
      .select(col("part"), col("term"), col("doc_id"), col("tf"), col("dl"))
      .repartition(cfg.numParts, col("part"))
      .sortWithinPartitions("part", "term", "doc_id")
      .as[(Int, String, Long, Long, Int)]
      .mapPartitions { it =>
        // single streaming pass: rows arrive sorted by (part, term,
        // doc_id); emit one compressed blob per (part, term) run
        val in = it.buffered
        new Iterator[PostingRow] {
          def hasNext: Boolean = in.hasNext
          def next(): PostingRow = {
            val (part, term, _, _, _) = in.head
            val docIds = scala.collection.mutable.ArrayBuffer.empty[Long]
            val tfs = scala.collection.mutable.ArrayBuffer.empty[Int]
            val dls = scala.collection.mutable.ArrayBuffer.empty[Int]
            var maxTf = 0
            var minDl = Int.MaxValue
            while (in.hasNext && in.head._1 == part && in.head._2 == term) {
              val (_, _, d, f, l) = in.next()
              docIds += d
              tfs += f.toInt
              dls += l
              if (f.toInt > maxTf) maxTf = f.toInt
              if (l < minDl) minDl = l
            }
            PostingRow(part, term, docIds.length.toLong, maxTf,
              if (minDl == Int.MaxValue) 0 else minDl,
              VarByte.encode(docIds.toArray, tfs.toArray, dls.toArray, blockSize))
          }
        }
      }.persist()

    val mode = if (resume && done.nonEmpty) "append" else "overwrite"
    postings.toDF().write.mode(mode).partitionBy("part")
      .parquet(IndexStore.postingsPath(root, seg))

    // per-partition lineage + metrics (north rule): rows, bytes, checksum
    val wallMs = (System.nanoTime() - t0) / 1000000
    val manifestRows = postings.toDF()
      .groupBy("part").agg(
        count(lit(1)).as("rows"),
        sum(length(col("blob"))).as("bytes"),
        sum(crc32(concat(col("term"), lit("|"), col("df_local").cast("string")))).as("cks"))
      .collect().map { r =>
        IndexStore.ManifestRow(r.getInt(0), r.getLong(1), r.getLong(2),
          r.getLong(3), inputSnapshot, wallMs)
      }.toSeq
    IndexStore.appendManifest(spark, root, seg, manifestRows)

    val termCount = termStats.count()
    val postingRows = postings.count()
    val report = BuildReport(seg, docCount, termCount, postingRows, wallMs)
    postings.unpersist()
    tf.unpersist()
    docs.unpersist()
    report
  }

  /** FULL build (reference `OpenMode.CREATE`, Indexer.java:199-204): one
    * segment, fresh snapshot id 0. */
  def buildFull(spark: SparkSession, pages: DataFrame, dict: SynonymDict,
                root: String, cfg: IndexConfig = IndexConfig(),
                inputSnapshot: String = ""): BuildReport = {
    val seg = "seg-000000"
    val report = buildSegment(spark, pages, dict, root, seg, 0L, cfg, inputSnapshot)
    IndexStore.writeSnapshot(spark, root, IndexStore.Snapshot(0L, Seq(seg), Seq.empty))
    report
  }

  /** APPEND build (reference `CREATE_OR_APPEND` + PK upsert, S1/S4): adds
    * a delta segment whose doc_ids start after the current maxDoc and
    * advances the snapshot. Latest-wins vs older segments is applied at
    * query time by [[graft.query.Searcher]] (like Lucene's liveDocs) and
    * made physical by [[merge]]. */
  def appendSegment(spark: SparkSession, pages: DataFrame, dict: SynonymDict,
                    root: String, cfg: IndexConfig = IndexConfig(),
                    inputSnapshot: String = ""): BuildReport = {
    val snap = IndexStore.readLatestSnapshot(spark, root)
      .getOrElse(sys.error(s"no snapshot at $root — run buildFull first"))
    val maxDoc = snap.segments.map { s =>
      spark.read.parquet(IndexStore.docstorePath(root, s))
        .agg(max("doc_id")).head() match {
          case r if r.isNullAt(0) => -1L
          case r => r.getLong(0)
        }
    }.foldLeft(-1L)(math.max)
    val seg = f"seg-${snap.id + 1}%06d"
    val report = buildSegment(spark, pages, dict, root, seg, maxDoc + 1, cfg, inputSnapshot)
    IndexStore.writeSnapshot(spark, root,
      IndexStore.Snapshot(snap.id + 1, snap.segments :+ seg, snap.tombstones))
    report
  }

  /** Delete by PK (S5, Indexer.java:915-917): tombstone the urls and
    * advance the snapshot; physical removal happens at [[merge]]. */
  def deleteByPk(spark: SparkSession, root: String, urls: Seq[String]): Unit = {
    val snap = IndexStore.readLatestSnapshot(spark, root)
      .getOrElse(sys.error(s"no snapshot at $root"))
    val name = f"tomb-${snap.id + 1}%06d"
    IndexStore.writeTombstones(spark, root, name, urls)
    IndexStore.writeSnapshot(spark, root,
      IndexStore.Snapshot(snap.id + 1, snap.segments, snap.tombstones :+ name))
  }

  /** Distributed segment merge / compaction: materializes the logical
    * view (latest-wins upserts + tombstones) back into a single fresh
    * segment and atomically swaps the snapshot — the analog of Lucene's
    * forceMerge + the reference's searcher hot-swap
    * (Searcher.java:527-583). Implemented as a rebuild from the merged
    * docstore, which preserves the byte-identical-text invariant because
    * docstore.text IS the extracted text. */
  def merge(spark: SparkSession, root: String, dict: SynonymDict,
            cfg: IndexConfig = IndexConfig()): BuildReport = {
    val snap = IndexStore.readLatestSnapshot(spark, root)
      .getOrElse(sys.error(s"no snapshot at $root"))
    val all = snap.segments.map(s =>
      spark.read.parquet(IndexStore.docstorePath(root, s))).reduce(_ unionByName _)
    val tombs = IndexStore.readTombstones(spark, root, snap.tombstones)
    val live = if (tombs.isEmpty) all else {
      import spark.implicits._
      all.join(broadcast(tombs.toDF("url")), Seq("url"), "left_anti")
    }
    // cross-segment latest-wins: newest warc_ts wins, ties to the later
    // segment (higher doc_id) — exactly the query-time liveDocs rule
    val w = Window.partitionBy("url")
      .orderBy(col("warc_ts").desc, col("doc_id").desc)
    val winners = live.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
    // docstore.text is already extracted; present it in the pages shape
    val pages = winners.select(col("url"), col("warc_ts"), lit(null).cast("binary").as("html"),
      col("text"), col("lang"))
    val seg = f"seg-${snap.id + 1}%06d"
    val report = buildSegment(spark, pages, dict, root, seg, 0L, cfg,
      s"merge-of-${snap.segments.mkString("+")}")
    IndexStore.writeSnapshot(spark, root,
      IndexStore.Snapshot(snap.id + 1, Seq(seg), Seq.empty))
    report
  }
}
