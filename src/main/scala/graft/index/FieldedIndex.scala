package graft.index

import graft.analysis.{SynonymDict, Tokenizer}
import graft.query.Searcher
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multi-field indexing with per-field analyzers — the reference's
  * schema-driven fields, each with its own analyzer and statistics
  * (`/root/reference/LuceneSearchEngine/src/Indexer.java:420` analyzer
  * dispatch; per-field `collectionStatistics`, `src/Searcher.java:
  * 722-725`).
  *
  * The Spark-native shape: one term-partitioned index PER FIELD under
  * `root/fields/<name>/`, each with its own analyzer mode, synonym
  * dictionary, and (df, avgdl) statistics — indexes are cheap partitioned
  * tables here, so fields compose as parallel builds instead of being
  * crammed into one segment file format. Doc ids are IDENTICAL across
  * fields because assignment depends only on the url total order
  * ([[IndexBuilder.assignDocIds]]), which is what makes cross-field
  * boolean composition a plain doc_id equi-join.
  */
object FieldedIndex {

  /** One searchable field: `text` = the field's source expression over
    * the pages frame (cast to string); `html` optionally feeds the
    * extract-on-null path (the body-text field's shape). */
  final case class FieldSpec(name: String, text: Column,
                             html: Column = lit(null).cast("binary"),
                             analyzer: String = Tokenizer.Text,
                             dict: SynonymDict = SynonymDict.empty)

  def fieldRoot(root: String, field: String): String = s"$root/fields/$field"

  /** FULL build of every field's index over the same pages frame. */
  def buildFull(spark: SparkSession, pages: DataFrame, fields: Seq[FieldSpec],
                root: String,
                cfg: IndexBuilder.IndexConfig = IndexBuilder.IndexConfig(),
                inputSnapshot: String = "")
      : Map[String, IndexBuilder.BuildReport] =
    fields.map { f =>
      val fp = pages.select(col("url"), col("warc_ts"),
        f.html.as("html"), f.text.cast("string").as("text"), col("lang"))
      f.name -> IndexBuilder.buildFull(spark, fp, f.dict,
        fieldRoot(root, f.name), cfg.copy(analyzer = f.analyzer),
        s"$inputSnapshot field=${f.name}")
    }.toMap

  /** Searcher over a fielded index: per-field search plus cross-field
    * conjunctive composition (the reference's BooleanQuery of per-field
    * clauses, `src/Searcher.java:734-736`). */
  final class FieldedSearcher(spark: SparkSession, root: String,
                              fields: Seq[FieldSpec]) extends AutoCloseable {
    val searchers: Map[String, Searcher] =
      fields.map(f =>
        f.name -> new Searcher(spark, fieldRoot(root, f.name), f.dict)).toMap

    def searcher(field: String): Searcher = searchers(field)

    /** Single-field BM25 top-k through that field's index + analyzer. */
    def searchField(field: String, query: String, k: Int, start: Int = 0,
                    conjunctive: Boolean = true): DataFrame =
      searchers(field).searchWand(query, k, start, conjunctive)

    /** Cross-field AND: docs matching EVERY per-field query; score =
      * Σ per-field BM25 scores, summed in field-name order (the fixed
      * fold that keeps doubles deterministic). Output:
      * (doc_id, score_<field>..., score). `roundScoresTo` rounds the
      * total BEFORE ranking — the oracle-parity knob for callers whose
      * reference ranking is over rounded scores (a raw-double rank with a
      * rounding-boundary tie at the k-th cutoff would otherwise pick a
      * different page than the rounded rank). */
    def searchMulti(queries: Map[String, String], k: Int,
                    start: Int = 0,
                    roundScoresTo: Option[Int] = None): DataFrame = {
      require(queries.nonEmpty, "searchMulti needs at least one field query")
      val ordered = queries.toSeq.sortBy(_._1)
      val perField = ordered.map { case (f, q) =>
        searchers(f).score(q)
          .select(col("doc_id"), col("score").as(s"score_$f"))
      }
      val joined = perField.reduce((a, b) => a.join(b, Seq("doc_id")))
      val total0 = ordered.map { case (f, _) => col(s"score_$f") }
        .reduce(_ + _)
      val total = roundScoresTo.fold(total0)(d => round(total0, d))
      joined.withColumn("score", total)
        .orderBy(col("score").desc, col("doc_id").asc)
        .offset(start).limit(k)
    }

    override def close(): Unit = searchers.values.foreach(_.close())
  }
}
