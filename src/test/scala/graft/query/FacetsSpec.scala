package graft.query

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Facet semantics beyond the DuckDB battery (SURVEY.md §2.5): paging
  * contract, multi-query batching (F7), facet-result cache (F6). */
class FacetsSpec extends AnyFunSuite with SparkTestBase {

  private def facets = {
    val sp = spark
    import sp.implicits._
    Seq(
      (1L, "color", "red"), (2L, "color", "red"), (3L, "color", "red"),
      (4L, "color", "blue"), (5L, "color", "blue"), (6L, "color", "green"),
      (1L, "size", "s"), (2L, "size", "m"), (3L, "size", "m")
    ).toDF("doc_id", "dim", "label")
  }

  private def matchesOf(ids: Long*) = {
    val sp = spark
    import sp.implicits._
    ids.toDF("doc_id")
  }

  test("flat counts: rank by (cnt desc, label asc), minCount, offset/limit " +
    "paging (F2, Searcher.java:1365-1429)") {
    val all = Facets.flatCounts(matchesOf(1L to 6L: _*), facets,
      offset = 0, limit = 10, minCount = 1)
      .orderBy("dim", "rank").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getInt(3)))
    assert(all.toSeq == Seq(
      ("color", "red", 3L, 1), ("color", "blue", 2L, 2), ("color", "green", 1L, 3),
      ("size", "m", 2L, 1), ("size", "s", 1L, 2)))
    // minCount prunes BEFORE ranking (size keeps only m@rank1), then
    // offset=1/limit=1 slices rank 2 → only color/blue survives
    val page = Facets.flatCounts(matchesOf(1L to 6L: _*), facets,
      offset = 1, limit = 1, minCount = 2)
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(page.toSeq == Seq(("color", "blue")))
    // match set restricts counts
    val restricted = Facets.flatCounts(matchesOf(4L, 5L, 6L), facets)
      .where(col("dim") === "color").orderBy("rank")
      .collect().map(r => (r.getString(1), r.getLong(2)))
    assert(restricted.toSeq == Seq(("blue", 2L), ("green", 1L)))
  }

  test("multi-query facet batch: one job counts per query_id (F7, " +
    "Searcher.java:1136-1278)") {
    val sp = spark
    import sp.implicits._
    val tagged = Seq((1L, "qa"), (2L, "qa"), (4L, "qb"), (6L, "qb"))
      .toDF("doc_id", "query_id")
    val out = Facets.flatCountsMultiQuery(tagged, facets)
      .where(col("dim") === "color")
      .orderBy("query_id", "label")
      .collect().map(r => (r.getString(0), r.getString(2), r.getLong(3)))
    assert(out.toSeq == Seq(("qa", "red", 2L), ("qb", "blue", 1L),
      ("qb", "green", 1L)))
  }

  test("facet-result LRU memoizes collated pages (F6, Searcher.java:1589-1612)") {
    val cache = new LruCache[(String, Int, Int, Long), Array[(String, Long)]](32)
    def counts(key: (String, Int, Int, Long)) =
      cache.getOrElseUpdate(key) {
        Facets.flatCounts(matchesOf(1L to 6L: _*), facets,
            offset = key._2, limit = key._3, minCount = key._4)
          .where(col("dim") === key._1)
          .collect().map(r => (r.getString(1), r.getLong(2)))
      }
    val k = ("color", 0, 10, 1L)
    val first = counts(k)
    val misses = cache.misses
    assert(counts(k).toSeq == first.toSeq && cache.misses == misses &&
      cache.hits >= 1)
  }
}
