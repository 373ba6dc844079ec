package graft.index

import graft.SparkTestBase
import graft.analysis.{SynonymDict, Tokenizer}
import graft.golden.GoldenBM25
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Multi-field indexing with per-field analyzers: each field is its own
  * index + analyzer + statistics; cross-field AND composes on doc_id.
  * Verified against per-field golden models. */
class FieldedIndexSpec extends AnyFunSuite with SparkTestBase {

  private val Seed = 42L
  private val N = 400

  test("keyword analyzer: split on non-alphanumerics, uppercase fold") {
    assert(Tokenizer.tokenize("https://site-3.example/page/123", Tokenizer.Keyword)
      .toSeq == Seq("HTTPS", "SITE", "3", "EXAMPLE", "PAGE", "123"))
    assert(Tokenizer.tokenize("a_b c.d", Tokenizer.Keyword).toSeq ==
      Seq("A", "B", "C", "D"))
    assert(Tokenizer.tokenize("", Tokenizer.Keyword).isEmpty)
    intercept[IllegalArgumentException](Tokenizer.tokenize("x", "bogus"))
  }

  private lazy val reports: Map[String, IndexBuilder.BuildReport] = {
    FieldedIndex.buildFull(spark, WebtextGen.df(spark, Seed, N),
      Seq(
        FieldedIndex.FieldSpec("text", col("text"), html = col("html")),
        FieldedIndex.FieldSpec("url", col("url"),
          analyzer = Tokenizer.Keyword)),
      rootDir, IndexBuilder.IndexConfig(numParts = 4, rangeParts = 2))
  }
  private lazy val rootDir: String = tmpDir("graft-fielded-")
  private def root: String = { reports; rootDir }

  test("single-pass build: the id-assignment shuffle runs once for the " +
    "whole field set, not once per field") {
    val assigns = reports.values.toSeq
      .flatMap(_.phases.map(_._1)).count(_ == "sort_dedup_assign")
    assert(assigns == 1, s"expected ONE shared sort_dedup_assign phase, " +
      s"got $assigns across ${reports.keySet}")
    // both fields saw the same deduped corpus
    assert(reports.values.map(_.docCount).toSet == Set(N.toLong))
  }

  private lazy val fs = new FieldedIndex.FieldedSearcher(spark, root,
    Seq(FieldedIndex.FieldSpec("text", col("text")),
      FieldedIndex.FieldSpec("url", col("url"),
        analyzer = Tokenizer.Keyword)))

  // per-field golden models over the same corpus and analyzers
  private lazy val pages = WebtextGen.pages(Seed, N)
  private def goldenDocs(tokens: WebtextGen.Page => Vector[String]) =
    pages.map(p => (p.url, p.lang, tokens(p)))
      .sortBy(_._1).zipWithIndex
      .map { case ((u, l, t), i) => GoldenBM25.Doc(i.toLong, u, l, t) }
      .toVector
  private lazy val goldenText = new GoldenBM25.Model(goldenDocs { p =>
    val text = if (p.text != null) p.text
      else graft.analysis.TextExtract.extractText(p.html)
    Tokenizer.tokenize(text).toVector
  })
  private lazy val goldenUrl = new GoldenBM25.Model(goldenDocs(p =>
    Tokenizer.tokenize(p.url, Tokenizer.Keyword).toVector))

  test("single-field search through the url field's keyword analyzer is " +
    "rank- and score-identical to its golden model") {
    // the url analyzer is read back from the field's segment config
    assert(fs.searcher("url").analyzerMode == Tokenizer.Keyword)
    assert(fs.searcher("text").analyzerMode == Tokenizer.Text)
    for (q <- Seq("page 123", "site 7 example", "https")) {
      val e = fs.searchField("url", q, 10).select("doc_id", "score")
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      val g = goldenUrl.topK(goldenUrl.analyze(q, SynonymDict.empty), 10)
        .map(h => (h.docId, h.score))
      assert(e == g, s"url query '$q'")
      assert(q != "page 123" || e.size == 1) // token 123 ⇒ exactly page/123
    }
  }

  test("cross-field AND: per-field scores summed in field order, " +
    "identical to the golden composition") {
    val e = fs.searchMulti(Map("text" -> "spark", "url" -> "7"), 10)
      .select("doc_id", "score")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val tScores = goldenText.scoreAll(
      goldenText.analyze("spark", SynonymDict.empty), conjunctive = true)
      .map(h => h.docId -> h.score).toMap
    val uScores = goldenUrl.scoreAll(
      goldenUrl.analyze("7", SynonymDict.empty), conjunctive = true)
      .map(h => h.docId -> h.score).toMap
    val g = (tScores.keySet intersect uScores.keySet).toSeq
      .map(id => (id, tScores(id) + uScores(id)))
      .sortBy { case (id, s) => (-s, id) }.take(10)
    assert(e == g)
    assert(e.nonEmpty)
  }

  test("dedup tie with complementary null fields is deterministic: " +
    "(null, x) and (x, null) get distinct tie keys, same winner either " +
    "input order") {
    import spark.implicits._
    val ts = new java.sql.Timestamp(1767225600000L)
    // two exact (url, warc_ts) duplicates differing only in WHICH field
    // is null — a null-skipping tie key would make the winner
    // partition-order-dependent
    val rows = Seq(
      ("https://dup.example/p/1", ts, "en", null.asInstanceOf[String], "alpha"),
      ("https://dup.example/p/1", ts, "en", "alpha", null.asInstanceOf[String]),
      ("https://other.example/p/2", ts, "en", "beta", "gamma"))
    def build(ordered: Seq[(String, java.sql.Timestamp, String, String, String)],
              parts: Int): (Seq[(String, String)], Seq[(String, String)]) = {
      val df = ordered.toDF("url", "warc_ts", "lang", "a", "b")
        .repartition(parts)
      val r = tmpDir("graft-nulltie-")
      FieldedIndex.buildFull(spark, df,
        Seq(FieldedIndex.FieldSpec("a", col("a")),
          FieldedIndex.FieldSpec("b", col("b"))),
        r, IndexBuilder.IndexConfig(numParts = 2, rangeParts = 2))
      def docs(f: String) = spark.read.parquet(
          IndexStore.docstorePath(FieldedIndex.fieldRoot(r, f), "seg-000000"))
        .select("url", "text").collect()
        .map(x => (x.getString(0), x.getString(1))).sortBy(_._1).toSeq
      (docs("a"), docs("b"))
    }
    val (a1, b1) = build(rows, 1)
    val (a2, b2) = build(rows.reverse, 3)
    assert(a1 == a2, "field a winner depends on input order")
    assert(b1 == b2, "field b winner depends on input order")
    // and the two duplicate rows were actually collapsed to one winner
    assert(a1.count(_._1 == "https://dup.example/p/1") == 1)
  }
}
