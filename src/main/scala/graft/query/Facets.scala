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

  /** One numeric facet range: [lower, upper] with per-bound inclusivity
    * (the Lucene LongRange/DoubleRange constructor shape). */
  final case class RangeSpec(label: String, lower: Double, upper: Double,
                             includeLower: Boolean = true,
                             includeUpper: Boolean = false) {
    def contains(v: Column): Column = {
      val lo = if (includeLower) v >= lower else v > lower
      val hi = if (includeUpper) v <= upper else v < upper
      lo && hi
    }
  }

  /** Range facet counts (the Lucene Long/DoubleRangeFacetCounts analog —
    * the one facet family the reference's sortedSet/taxonomy surface
    * lacks): per declared range, how many match-set docs carry a value
    * inside it. Ranges may overlap (a doc counts once per covering
    * range) and empty ranges surface with cnt 0, both like Lucene.
    *
    * Scale shape: the ranges are a tiny literal list, so every per-range
    * count rides ONE map-side partial aggregation to a single row — no
    * per-label shuffle at all (vs flatCounts' groupBy) — then the row is
    * unpivoted driver-free into (label, cnt) preserving declaration
    * order. */
  def rangeCounts(matches: DataFrame, values: DataFrame, valueCol: String,
                  ranges: Seq[RangeSpec]): DataFrame = {
    require(ranges.nonEmpty, "rangeCounts needs at least one range")
    require(ranges.map(_.label).distinct.size == ranges.size,
      "range labels must be unique")
    val base = values.join(matches, Seq("doc_id"), "left_semi")
    val v = col(valueCol)
    val aggs = ranges.zipWithIndex.map { case (r, i) =>
      sum(when(r.contains(v), 1L).otherwise(0L)).as(s"_r$i")
    }
    val row = base.agg(aggs.head, aggs.tail: _*)
    row.select(explode(array(ranges.zipWithIndex.map { case (r, i) =>
        struct(lit(r.label).as("label"),
          coalesce(col(s"_r$i"), lit(0L)).as("cnt"))
      }: _*)).as("x"))
      .select(col("x.label").as("label"), col("x.cnt").as("cnt"))
  }

  /** Drill-sideways facet counts (the Lucene DrillSideways analog): with
    * drill-down constraints `dim -> label` applied, each DRILLED dim's
    * own counts are computed with every OTHER constraint applied but not
    * its own (the "what could I switch this filter to" counts a faceted
    * UI shows), while undrilled dims count under ALL constraints — and
    * the hit set itself is the fully-drilled intersection.
    *
    * Scale shape: each constraint's doc set is one semi-join (the facet
    * side pre-filtered to a single (dim, label) — small); a query with D
    * drill-downs costs D+1 counting aggregations over semi-join-restricted
    * match sets, never a cross join. Paging per dim mirrors flatCounts'
    * (count desc, label asc) window contract. */
  def drillSideways(matches: DataFrame, facets: DataFrame,
                    drillDowns: Map[String, String],
                    limit: Int = 10, minCount: Long = 1): DataFrame = {
    require(drillDowns.nonEmpty, "drillSideways needs at least one drill-down")
    val dims = drillDowns.keys.toSeq.sorted
    def constraintDocs(dim: String): DataFrame =
      facets.where(col("dim") === dim && col("label") === drillDowns(dim))
        .select("doc_id")
    def restrict(base: DataFrame, exclude: Option[String]): DataFrame =
      dims.filterNot(exclude.contains).foldLeft(base)((m, d) =>
        m.join(constraintDocs(d), Seq("doc_id"), "left_semi"))
    // sideways leg per drilled dim: own constraint dropped
    val sideways = dims.map { d =>
      facets.where(col("dim") === d)
        .join(restrict(matches, exclude = Some(d)), Seq("doc_id"), "left_semi")
        .groupBy("dim", "label").agg(count(lit(1)).as("cnt"))
    }
    // undrilled dims: every constraint applied
    val drilledAll = restrict(matches, exclude = None)
    val rest = facets.where(!col("dim").isin(dims: _*))
      .join(drilledAll, Seq("doc_id"), "left_semi")
      .groupBy("dim", "label").agg(count(lit(1)).as("cnt"))
    val counted = (sideways :+ rest).reduce(_ unionByName _)
      .where(col("cnt") >= minCount)
    val w = Window.partitionBy("dim").orderBy(col("cnt").desc, col("label").asc)
    counted.withColumn("rank", row_number().over(w))
      .where(col("rank") <= limit)
      .select("dim", "label", "cnt", "rank")
  }

  /** Grouped top-k (the Lucene grouping module's TopGroups analog) —
    * the ONE window definition [[graft.query.Searcher.searchGrouped]]
    * and the fielded twin share: groups rank by their best-scoring doc
    * (score desc, label asc ties — dense_rank so every row of a group
    * carries the GROUP's rank), each group keeps its top `docsPerGroup`
    * docs by (score desc, doc_id asc). Lucene's two-pass grouping
    * collector collapsed into one label-partitioned window + a global
    * rank over one row per group head (#labels rows — facet-dim
    * cardinality, the same driver-scale object TopGroups materializes). */
  def groupTopK(scored: DataFrame, labels: DataFrame,
                topGroups: Int, docsPerGroup: Int): DataFrame = {
    val labeled = scored.select("doc_id", "score")
      .join(labels.select("doc_id", "label"), Seq("doc_id"))
    val wDoc = Window.partitionBy("label")
      .orderBy(col("score").desc, col("doc_id").asc)
    val wGroupBest = Window.partitionBy("label")
    val wGroupRank = Window.orderBy(col("group_best").desc, col("label").asc)
    labeled
      .withColumn("doc_rank", row_number().over(wDoc))
      .where(col("doc_rank") <= docsPerGroup)
      .withColumn("group_best", max(col("score")).over(wGroupBest))
      .withColumn("group_rank", dense_rank().over(wGroupRank))
      .where(col("group_rank") <= topGroups)
      .select("label", "group_rank", "doc_id", "score", "doc_rank")
  }
}
