package graft.query

import graft.SparkTestBase
import graft.analysis.SynonymDict
import graft.index.{IndexBuilder, WebtextGen}
import org.scalatest.funsuite.AnyFunSuite

/** Serving-layer parity (SURVEY.md Q13/S8/Q10): result + doc LRU caches
  * and job-group search timeout. */
class ServingSpec extends AnyFunSuite with SparkTestBase {

  private lazy val root: String = {
    val dir = tmpDir("graft-serving-")
    IndexBuilder.buildFull(spark, WebtextGen.df(spark, 7L, 400),
      SynonymDict.empty, dir,
      IndexBuilder.IndexConfig(numParts = 4, rangeParts = 2), "serving")
    dir
  }
  private lazy val searcher = new Searcher(spark, root)

  test("query-result LRU returns identical rows and actually hits (Q13)") {
    val a = searcher.searchCached("spark index", 10)
    val missesAfterFirst = searcher.queryResultCache.misses
    val b = searcher.searchCached("spark index", 10)
    assert(a.toSeq == b.toSeq)
    assert(searcher.queryResultCache.hits >= 1)
    assert(searcher.queryResultCache.misses == missesAfterFirst)
    // opt-out recomputes but agrees
    val c = searcher.searchCached("spark index", 10, useCache = false)
    assert(c.toSeq == a.toSeq)
  }

  test("document LRU caches stored-field fetches (S8)") {
    val ids = searcher.searchCached("spark", 3).map(_.getLong(0)).toSeq
    val d1 = searcher.docCached(ids)
    assert(d1.map(_.getLong(0)) == ids)
    val h0 = searcher.documentCache.hits
    val d2 = searcher.docCached(ids)
    assert(d2.map(_.getLong(0)) == ids)
    assert(searcher.documentCache.hits >= h0 + ids.size)
  }

  test("search timeout: generous deadline completes, ~zero deadline " +
    "cancels (Q10)") {
    val ok = searcher.searchWithTimeout("spark", 5, timeoutMs = 120000)
    assert(ok.isDefined && ok.get.nonEmpty)
    assert(ok.get.toSeq == searcher.search("spark", 5).collect().toSeq)
    val timedOut = searcher.searchWithTimeout("index engine data", 5,
      timeoutMs = 1)
    assert(timedOut.isEmpty)
  }

  test("LRU eviction respects capacity") {
    val c = new LruCache[Int, Int](2)
    c.put(1, 1); c.put(2, 2)
    c.get(1) // touch 1 → 2 is eldest
    c.put(3, 3)
    assert(c.get(2).isEmpty && c.get(1).contains(1) && c.get(3).contains(3))
  }

  override def afterAll(): Unit = {
    searcher.close()
    super.afterAll()
  }
}
