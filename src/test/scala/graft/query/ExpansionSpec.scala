package graft.query

import graft.SparkTestBase
import graft.analysis.SynonymDict
import graft.golden.GoldenBM25
import graft.index.{IndexBuilder, WebtextGen}
import graft.pipeline.TextOps
import org.apache.spark.sql.functions.{col, levenshtein, lit}
import org.scalatest.funsuite.AnyFunSuite

/** Multi-term query expansion (prefix/wildcard/fuzzy), more-like-this
  * and highlighting: the index paths must be rank-identical with
  * bit-identical scores to the golden model's expansion contract, and
  * the on-the-fly pipeline twins must match a golden replay at their
  * rounded-score contract. */
class ExpansionSpec extends AnyFunSuite with SparkTestBase {

  private val Seed = 42L
  private val NDocs = 800
  private val K = 10

  private lazy val dict = SynonymDict.parse(resourceLines("/synonyms.txt"))

  private lazy val root: String = {
    val dir = tmpDir("graft-exp-")
    val cfg = IndexBuilder.IndexConfig(numParts = 8, rangeParts = 4)
    IndexBuilder.buildFull(spark, WebtextGen.df(spark, Seed, NDocs), dict,
      dir, cfg, inputSnapshot = s"webtext(seed=$Seed,n=$NDocs)")
    dir
  }

  private lazy val searcher = new Searcher(spark, root, dict)
  private lazy val golden =
    new GoldenBM25.Model(GoldenBM25.docsFromWebtext(Seed, NDocs, dict))

  private def collectHits(df: org.apache.spark.sql.DataFrame) =
    df.select("doc_id", "score").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq

  private def goldenExpanded(pred: String => Boolean, k: Int,
                             filter: GoldenBM25.Doc => Boolean = _ => true)
      : Seq[(Long, Double)] =
    golden.topK(golden.expandTerms(pred), k, conjunctive = false,
      filter = filter).map(h => (h.docId, h.score))

  test("prefix query is rank- and score-identical to golden expansion") {
    // derive prefixes from the corpus dictionary so the test is robust
    // to generator vocabulary changes; require real multi-term expansion
    val dictTerms = golden.expandTerms(_ => true)
    val prefixes = dictTerms.map(_.take(1)).distinct.sorted.take(6)
    assert(prefixes.exists(p => dictTerms.count(_.startsWith(p)) > 1),
      "degenerate corpus: no prefix expands to more than one term")
    prefixes.foreach { p =>
      val e = collectHits(searcher.searchPrefix(p, K))
      val g = goldenExpanded(_.startsWith(p), K)
      assert(e == g, s"prefix '$p': engine=${e.take(3)} golden=${g.take(3)}")
    }
  }

  test("prefix query composes with a non-scoring filter clause") {
    val p = golden.expandTerms(_ => true).head.take(1)
    val e = collectHits(
      searcher.searchPrefix(p, K, filter = Some(col("lang") === "en")))
    val g = goldenExpanded(_.startsWith(p), K, filter = _.lang == "en")
    assert(e == g)
  }

  test("wildcard query (contains pattern) matches golden expansion") {
    val e = collectHits(searcher.searchWildcard("%A%", K))
    val g = goldenExpanded(_.contains("A"), K)
    assert(e == g)
  }

  test("fuzzy query expands by Levenshtein distance and matches golden") {
    // a dictionary term, one mutated (still distance<=1 of the original),
    // and a nonsense probe near several terms
    val t0 = golden.expandTerms(t => t.length >= 4).head
    val mutated = ("Z" + t0.tail)
    Seq(t0, mutated).foreach { q =>
      val e = collectHits(searcher.searchFuzzy(q, K, maxEdits = 1))
      val g = goldenExpanded(GoldenBM25.levenshtein(_, q) <= 1, K)
      assert(e == g, s"fuzzy '$q': engine=${e.take(3)} golden=${g.take(3)}")
      assert(g.nonEmpty, s"fuzzy '$q' matched nothing — degenerate case")
    }
  }

  test("term range query matches golden expansion at all bound shapes") {
    val terms = golden.expandTerms(_ => true).sorted
    assert(terms.size >= 8, "degenerate dictionary")
    val (lo, hi) = (terms(terms.size / 4), terms(3 * terms.size / 4))
    // closed-closed
    val cap = terms.size + 1
    val e = collectHits(
      searcher.searchTermRange(Some(lo), Some(hi), K, maxExpansions = cap))
    val g = goldenExpanded(t => t >= lo && t <= hi, K)
    assert(e == g, s"range [$lo,$hi]: engine=${e.take(3)} golden=${g.take(3)}")
    assert(g.nonEmpty)
    // open-closed exclusive upper
    val e2 = collectHits(searcher.searchTermRange(None, Some(hi), K,
      includeUpper = false, maxExpansions = cap))
    val g2 = goldenExpanded(t => t < hi, K)
    assert(e2 == g2)
    // exclusive lower, open upper
    val e3 = collectHits(searcher.searchTermRange(Some(lo), None, K,
      includeLower = false, maxExpansions = cap))
    val g3 = goldenExpanded(t => t > lo, K)
    assert(e3 == g3)
    // open-open = match-all dictionary -> loud cap on a real dictionary
    val ex = intercept[IllegalArgumentException] {
      searcher.searchTermRange(None, None, K, maxExpansions = 2)
    }
    assert(ex.getMessage.contains("maxExpansions"))
  }

  test("regexp query anchors the pattern over whole terms like Lucene") {
    val t0 = golden.expandTerms(t => t.length >= 3).head
    val cap = golden.expandTerms(_ => true).size + 1
    // a pattern matching t0 plus same-prefix siblings: first char, any tail
    val pat = t0.take(1) + "[A-Z0-9]*"
    val e = collectHits(searcher.searchRegexp(pat, K, maxExpansions = cap))
    val g = goldenExpanded(_.matches(pat), K)
    assert(e == g, s"regexp '$pat': engine=${e.take(3)} golden=${g.take(3)}")
    assert(g.nonEmpty)
    // substring-shaped pattern must NOT match unanchored (whole-term only)
    val inner = t0.drop(1).dropRight(1)
    if (inner.nonEmpty) {
      val eInner = collectHits(searcher.searchRegexp(
        java.util.regex.Pattern.quote(inner), K))
      val gInner = goldenExpanded(_ == inner, K)
      assert(eInner == gInner, "pattern must cover the whole term")
    }
  }

  test("expansion cap fails loudly instead of silently truncating") {
    val ex = intercept[IllegalArgumentException] {
      searcher.searchWildcard("%", K, maxExpansions = 2)
    }
    assert(ex.getMessage.contains("maxExpansions"))
  }

  test("empty expansion returns an empty page") {
    assert(searcher.searchPrefix("ZZZZNOPE", K).count() === 0L)
    assert(searcher.searchFuzzy("QQQQQQQQQQ", K, maxEdits = 1).count() === 0L)
  }

  test("more-like-this matches the golden term selection and scoring") {
    Seq(3L, 17L, 100L).foreach { id =>
      val e = collectHits(searcher.searchMoreLikeThis(id, K))
      val terms = golden.mltTerms(id, 10)
      val g = golden.topK(terms, K, conjunctive = false,
        filter = _.docId != id).map(h => (h.docId, h.score))
      assert(e == g, s"mlt $id: engine=${e.take(3)} golden=${g.take(3)}")
      assert(g.nonEmpty)
      assert(!e.exists(_._1 == id), "source doc must be excluded")
    }
  }

  test("highlight page carries golden (match_pos, snippet) per hit") {
    val query = {
      // any query with hits from the reference set's vocabulary
      val t = golden.expandTerms(_ => true).maxBy(golden.df)
      t.toLowerCase
    }
    val page = searcher.searchHighlight(query, K, conjunctive = false)
      .select("doc_id", "score", "match_pos", "snippet").collect()
    assert(page.nonEmpty)
    val terms = searcher.analyzeQuery(query).toSet
    page.foreach { r =>
      val (pos, snip) = golden.highlight(r.getLong(0), terms)
      assert(r.getLong(2) == pos, s"doc ${r.getLong(0)} match_pos")
      assert(r.getString(3) == snip, s"doc ${r.getLong(0)} snippet")
    }
    // scores identical to the plain search page
    val plain = collectHits(searcher.search(query, K, conjunctive = false))
    assert(page.map(r => (r.getLong(0), r.getDouble(1))).toSeq == plain)
  }

  // ---- on-the-fly pipeline twins (rounded-score contract) ------------

  private lazy val pipeDocs = {
    import scala.jdk.CollectionConverters._
    val texts = Seq(
      "spark join fast scan",
      "slow scan spark spark",
      "sort merge join",
      "port data batch port",
      "spark sort part column",
      "scan small filter",
      "" // token-less doc
    )
    val rows = texts.zipWithIndex.map { case (t, i) =>
      org.apache.spark.sql.Row(i.toLong, t)
    }
    spark.createDataFrame(rows.asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("text",
          org.apache.spark.sql.types.StringType))))
  }

  private lazy val pipeGolden = new GoldenBM25.Model(
    Seq("spark join fast scan", "slow scan spark spark", "sort merge join",
      "port data batch port", "spark sort part column", "scan small filter",
      "").zipWithIndex.map { case (t, i) =>
      GoldenBM25.Doc(i.toLong, s"u$i", "en",
        t.split(' ').filter(_.nonEmpty).map(_.toUpperCase).toVector)
    })

  private def round4(x: Double): Double =
    BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("pipeline bm25TopKExpanded replays the golden expansion contract") {
    val e = TextOps.bm25TopKExpanded(pipeDocs, "doc_id", "text",
        col("term").startsWith("S"), 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val g = pipeGolden.topK(pipeGolden.expandTerms(_.startsWith("S")), 10,
        conjunctive = false)
      .map(h => (h.docId, round4(h.score)))
    assert(e == g)

    val f = TextOps.bm25TopKExpanded(pipeDocs, "doc_id", "text",
        levenshtein(col("term"), lit("PORT")) <= 1, 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val gf = pipeGolden.topK(
        pipeGolden.expandTerms(GoldenBM25.levenshtein(_, "PORT") <= 1), 10,
        conjunctive = false)
      .map(h => (h.docId, round4(h.score)))
    assert(f == gf)
    assert(gf.nonEmpty)
  }

  test("pipeline moreLikeThisTopK replays the golden MLT contract") {
    val e = TextOps.moreLikeThisTopK(pipeDocs, "doc_id", "text", 0L, 10,
        maxQueryTerms = 3)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val g = pipeGolden.topK(pipeGolden.mltTerms(0L, 3), 10,
        conjunctive = false, filter = _.docId != 0L)
      .map(h => (h.docId, round4(h.score)))
    assert(e == g)
    assert(g.nonEmpty)
  }

  test("pipeline highlightTopK replays the golden snippet contract") {
    val rows = TextOps.highlightTopK(pipeDocs, "doc_id", "text",
        Seq("spark", "sort"), 10)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (pos, snip) = pipeGolden.highlight(r.getLong(0),
        Set("SPARK", "SORT"))
      assert(r.getLong(2) == pos)
      assert(r.getString(3) == snip)
    }
  }
}
