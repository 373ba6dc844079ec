package graft.query

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Facets — the reference's group-bys (SURVEY.md §2.5, cites into
  * `/root/reference/LuceneSearchEngine/src/Searcher.java`).
  *
  * Input shape: a `matches` frame (doc_id) — the query's match set
  * (Q8/SETONLY, :816-820) — joined against a facet side table. Flat
  * facets are `(doc_id, dim, label)` rows; hierarchical facets are
  * `(doc_id, dim, path ARRAY<STRING>)`.
  */
object Facets {

  /** Flat facet counts with the reference's paging contract
    * (`getAllDims(offset, limit, minCount)`, :1365-1429): per dim, labels
    * ranked by (count desc, label asc), `cnt >= minCount`, slice
    * [offset, offset+limit). One shuffle for the count, one window pass
    * for the rank. */
  def flatCounts(matches: DataFrame, facets: DataFrame,
                 offset: Int = 0, limit: Int = 10,
                 minCount: Long = 1): DataFrame = {
    val counted = facets.join(matches, Seq("doc_id"), "left_semi")
      .groupBy("dim", "label").agg(count(lit(1)).as("cnt"))
      .where(col("cnt") >= minCount)
    val w = Window.partitionBy("dim").orderBy(col("cnt").desc, col("label").asc)
    counted.withColumn("rank", row_number().over(w))
      .where(col("rank") > offset && col("rank") <= offset + limit)
      .select("dim", "label", "cnt", "rank")
  }

  /** Facet math (per-label stats over a numeric reference field,
    * :1438-1555): count, sum, min, max, average per label — plus the
    * whole-dim `*_total` row via ROLLUP (grouping sets: one shuffle
    * computes labels AND totals). Numbers rounded to 2dp at the edge like
    * the reference's formatter (:1519-1543). */
  def facetMath(matches: DataFrame, facets: DataFrame,
                valueCol: String): DataFrame = {
    val base = facets.join(matches, Seq("doc_id"), "left_semi")
      .select(col("label"), col(valueCol))
    val aggs = Seq(
      count(lit(1)).as("cnt"),
      round(sum(valueCol), 2).as("sum"),
      round(min(valueCol), 2).as("min"),
      round(max(valueCol), 2).as("max"),
      round(avg(valueCol), 2).as("average"))
    // per-label + whole-dim `*_total` as two aggregations (both map-side
    // partial-agg'd; the total leg reduces to one row per partition before
    // the shuffle — cheaper at scale than ROLLUP's row-doubling Expand,
    // which also trips Spark's ambiguous-self-join detector here)
    val perLabel = base.groupBy("label").agg(aggs.head, aggs.tail: _*)
    val total = base.agg(aggs.head, aggs.tail: _*)
      .withColumn("label", lit("*_total"))
      .select("label", "cnt", "sum", "min", "max", "average")
    perLabel.unionByName(total)
  }

  /** Hierarchical (taxonomy) facet tree (:1285-1363): explode every path
    * prefix, count per (dim, prefix) — ONE shuffle computes every tree
    * level, vs the reference's per-label recursive `getTopChildren`
    * re-query. The driver assembles the tree from the flat rows. */
  def hierarchicalCounts(matches: DataFrame, facets: DataFrame,
                         topN: Int = 10): DataFrame = {
    val prefixes = facets.join(matches, Seq("doc_id"), "left_semi")
      .select(col("dim"), explode(
        transform(sequence(lit(1), size(col("path"))),
          i => slice(col("path"), lit(1), i))).as("prefix"))
    val counted = prefixes.groupBy("dim", "prefix").agg(count(lit(1)).as("cnt"))
      .withColumn("depth", size(col("prefix")))
    val w = Window.partitionBy(col("dim"), col("depth"),
        expr("slice(prefix, 1, size(prefix) - 1)"))
      .orderBy(col("cnt").desc, col("prefix").asc)
    counted.withColumn("rank", row_number().over(w))
      .where(col("rank") <= topN)
      .select("dim", "prefix", "depth", "cnt", "rank")
  }

  /** Multi-query facet batch (F7, :1136-1278): instead of looping queries
    * through separate jobs, union the match sets tagged with query_id and
    * group once. */
  def flatCountsMultiQuery(taggedMatches: DataFrame, facets: DataFrame): DataFrame =
    facets.join(taggedMatches, Seq("doc_id"))
      .groupBy("query_id", "dim", "label").agg(count(lit(1)).as("cnt"))
}
