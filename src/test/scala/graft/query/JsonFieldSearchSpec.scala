package graft.query

import graft.SparkTestBase
import graft.analysis.SynonymDict
import graft.index.{IndexBuilder, WebtextGen}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Searchable dynamic JSON subfields through the index (reference
  * addJson fields, Indexer.java:639-747; discovery Searcher.java:
  * 397-477): sidecar build, catalog discovery, filter + sort serving. */
class JsonFieldSearchSpec extends AnyFunSuite with SparkTestBase {

  private lazy val dict = SynonymDict.empty

  private lazy val root: String = {
    val dir = tmpDir("graft-jsonidx-")
    IndexBuilder.buildFull(spark, WebtextGen.df(spark, 21L, 200), dict, dir,
      IndexBuilder.IndexConfig(numParts = 4, rangeParts = 2))
    // deterministic json per url: nested numeric + string + a date
    val jsonByUrl = WebtextGen.df(spark, 21L, 200).select(col("url"),
      format_string(
        """{"meta": {"len": %d, "host": "%s"}, "seen": "2021-03-04 05:06:07"}""",
        length(col("url")), regexp_extract(col("url"), "://([^/]+)", 1))
        .as("json"))
    IndexBuilder.buildJsonSidecar(spark, dir, jsonByUrl)
    dir
  }

  private lazy val searcher = new Searcher(spark, root, dict)

  test("field catalog discovers dynamic keys with reference typing " +
    "(numbers → FLOAT, date-shaped strings → DATE, rest → VARCHAR)") {
    val cat = searcher.jsonFieldCatalog.collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(cat == Set(("META.LEN", "FLOAT", 200L),
      ("META.HOST", "VARCHAR", 200L), ("SEEN", "DATE", 200L)))
  }

  test("json-filtered search: top-k equals plain search restricted to the " +
    "predicate's doc set; non-scoring (Q1 semantics)") {
    val filtered = searcher.searchJsonFiltered("spark", 200, "META.LEN",
        col("num_val") > 29.0)
      .select("doc_id", "score", "url")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getString(2)))
    assert(filtered.nonEmpty)
    assert(filtered.forall(_._3.length > 29))
    val plain = searcher.search("spark", 200)
      .select("doc_id", "score", "url")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getString(2)))
      .filter(_._3.length > 29)
    assert(filtered.toSeq == plain.toSeq) // same docs, same scores, same order
  }

  test("sort by dynamic numeric field: matches ordered by META.LEN") {
    val rows = searcher.searchSortByJsonField("spark", "META.LEN", 10)
      .select("doc_id", "sort_value", "url")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getString(2)))
    assert(rows.nonEmpty)
    assert(rows.forall { case (_, v, u) => v == u.length.toDouble })
    val sorted = rows.sortBy { case (id, v, _) => (-v, id) }
    assert(rows.toSeq == sorted.toSeq)
  }

  test("missing sidecar fails loudly") {
    val dir = tmpDir("graft-nojson-")
    IndexBuilder.buildFull(spark, WebtextGen.df(spark, 22L, 40), dict, dir,
      IndexBuilder.IndexConfig(numParts = 4, rangeParts = 2))
    val s = new Searcher(spark, dir, dict)
    try {
      val e = intercept[RuntimeException](s.jsonFieldCatalog)
      assert(e.getMessage.contains("buildJsonSidecar"))
    } finally s.close()
  }

  override def afterAll(): Unit = {
    searcher.close()
    super.afterAll()
  }
}
