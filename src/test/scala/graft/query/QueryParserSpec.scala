package graft.query

import graft.SparkTestBase
import graft.analysis.SynonymDict
import graft.golden.GoldenBM25
import graft.index.{IndexBuilder, WebtextGen}
import org.scalatest.funsuite.AnyFunSuite

/** The classic-QueryParser analog: grammar unit tests over
  * [[QueryParser]] and golden-identity end-to-end tests over
  * [[Searcher.scoreParsed]] / [[Searcher.searchQuery]] /
  * [[Searcher.explainScore]] on the shared webtext corpus (positional
  * index, so phrase clauses compose too). */
class QueryParserSpec extends AnyFunSuite with SparkTestBase {

  import QueryParser._

  private val Seed = 42L
  private val NDocs = 600
  private val K = 10

  private lazy val dict = SynonymDict.parse(resourceLines("/synonyms.txt"))

  private lazy val root: String = {
    val dir = tmpDir("graft-parseidx-")
    val cfg = IndexBuilder.IndexConfig(numParts = 8, rangeParts = 4,
      saltDf = 200, saltFanout = 4, indexPositions = true)
    IndexBuilder.buildFull(spark, WebtextGen.df(spark, Seed, NDocs), dict,
      dir, cfg, inputSnapshot = s"webtext(seed=$Seed,n=$NDocs)")
    dir
  }

  private lazy val searcher = new Searcher(spark, root, dict)
  private lazy val goldenDocs = GoldenBM25.docsFromWebtext(Seed, NDocs, dict)
  private lazy val golden = new GoldenBM25.Model(goldenDocs)

  // ---- grammar ---------------------------------------------------------

  test("grammar: every clause form, occurs, boosts, slop") {
    val cs = parse("""+spark data^2.5 -slow "fast index"~1^3 pre* """ +
      """wi?ld fuzzy~1 bare~ /S[A-Z]+K/ [aa TO ff} {* TO zz]^0.5""")
    assert(cs == Seq(
      TermQ("spark", Must, 1.0),
      TermQ("data", Should, 2.5),
      TermQ("slow", MustNot, 1.0),
      PhraseQ("fast index", 1, Should, 3.0),
      PrefixQ("pre", Should, 1.0),
      WildcardQ("wi?ld", Should, 1.0),
      FuzzyQ("fuzzy", 1, Should, 1.0),
      FuzzyQ("bare", 2, Should, 1.0), // bare ~ = Lucene's 2-edit default
      RegexpQ("S[A-Z]+K", Should, 1.0),
      RangeQ(Some("aa"), Some("ff"), includeLower = true,
        includeUpper = false, Should, 1.0),
      RangeQ(None, Some("zz"), includeLower = false,
        includeUpper = true, Should, 0.5)))
  }

  test("grammar: escapes, a lone trailing star is prefix, inner is wildcard") {
    assert(parse("""sp\*ark""") == Seq(TermQ("sp*ark", Should, 1.0)))
    assert(parse("""a\:b""") == Seq(TermQ("a:b", Should, 1.0)))
    assert(parse("ab*") == Seq(PrefixQ("ab", Should, 1.0)))
    assert(parse("a*b") == Seq(WildcardQ("a*b", Should, 1.0)))
    assert(parse("a*b*") == Seq(WildcardQ("a*b*", Should, 1.0)))
    assert(parse("*ab") == Seq(WildcardQ("*ab", Should, 1.0)))
    assert(parse("\"q\\\"uote\"") == Seq(PhraseQ("q\"uote", 0, Should, 1.0)))
    assert(parse("/a\\/b/") == Seq(RegexpQ("a/b", Should, 1.0)))
    assert(parse("/a\\db/") == Seq(RegexpQ("a\\db", Should, 1.0)))
  }

  test("grammar: one group level — occur and boost distribute, members " +
    "parse as full clauses") {
    assert(parse("""+(a b*)^2 c""") == Seq(
      GroupQ(Seq(TermQ("a", Should, 1.0), PrefixQ("b", Should, 1.0)),
        Must, 2.0),
      TermQ("c", Should, 1.0)))
    assert(parse("""-(x y) +z""") == Seq(
      GroupQ(Seq(TermQ("x", Should, 1.0), TermQ("y", Should, 1.0)),
        MustNot, 1.0),
      TermQ("z", Must, 1.0)))
    assert(parse("""("a b"~1^3 fu~1)""") == Seq(
      GroupQ(Seq(PhraseQ("a b", 1, Should, 3.0),
        FuzzyQ("fu", 1, Should, 1.0)), Should, 1.0)))
  }

  test("grammar: loud failures on unsupported or malformed syntax") {
    for (bad <- Seq("+(a +b)", "(a -b)", "((a) b)", "(a (b))", "()",
        "(a", "a)", "a(b", "field:term", "+", "- a",
        "\"unterminated", "/unterminated", "[a TO", "[a b]", "a^x",
        "a^0", "a^-2", "\"a b\"~x", "wi*ld~1", "", "   "))
      assertThrows[IllegalArgumentException](parse(bad))
  }

  // ---- end-to-end golden identity ---------------------------------------

  private def engine(q: String): Seq[(Long, Double)] =
    searcher.searchQuery(q, K).select("doc_id", "score")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq

  private def goldenQ(q: String): Seq[(Long, Double)] =
    golden.scoreParsed(parse(q), dict)
      .sortBy(h => (-h.score, h.docId)).take(K)
      .map(h => (h.docId, h.score))

  test("parsed queries are rank- and score-identical to the golden twin " +
    "across every clause form and composition") {
    // a guaranteed-present bigram for the phrase clauses
    val d = goldenDocs.filter(_.tokens.size >= 8).head
    val bigram = d.tokens.slice(3, 5).mkString(" ").toLowerCase
    val skip = Seq(d.tokens(3), d.tokens(5)).mkString(" ").toLowerCase
    val queries = Seq(
      "+spark index^2",                       // mixed MUST + boosted SHOULD
      "spark index fast",                     // pure SHOULD (disjunction)
      "+spark +index",                        // pure MUST (conjunction)
      "+spark inde* -fast",                   // prefix + NOT
      "spark^3 sp*k",                         // boost + wildcard overlap
      "+spark spark^2",                       // same term MUST and boosted
      "spark~1",                              // fuzzy
      "/SPAR[A-Z]/ index",                    // regexp + term
      "[spar TO spat] -index",                // range + NOT
      s"""+"$bigram" spark""",                // MUST phrase + SHOULD term
      s""""$skip"~1^2 +spark""",              // boosted slop phrase + MUST
      s"""spark -"$bigram"""",                // NOT phrase
      "+spark -zzznothing",                   // NOT term absent from index
      "zzznothing spark",                     // SHOULD absent term
      "+(index engine) spark",                // MUST any-of group
      "+spark (inde* fast^2)^2",              // boosted group: boosts multiply
      "-(fast slow) spark",                   // NOT group
      "+(zzznothing index) spark",            // MUST group, one absent member
      s"""+("$bigram" zzznothing) spark""",   // MUST group via phrase member
      "+(index engine) +(fast slow) -spark"   // two groups + NOT
    )
    val failures = queries.flatMap { q =>
      val e = engine(q)
      val g = goldenQ(q)
      if (e == g) None
      else Some(s"<$q>: engine=${e.take(3)} golden=${g.take(3)} " +
        s"(sizes ${e.size}/${g.size})")
    }
    assert(failures.isEmpty, failures.mkString("\n"))
    assert(engine("+spark index^2").nonEmpty)
    assert(engine(s"""+"$bigram" spark""").nonEmpty)
  }

  test("degenerate parses reproduce the plain search paths bit-identically") {
    def page(df: org.apache.spark.sql.DataFrame): Seq[(Long, Double)] =
      df.select("doc_id", "score")
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(engine("+spark +index") ==
      page(searcher.search("spark index", K, conjunctive = true)))
    assert(engine("spark index") ==
      page(searcher.search("spark index", K, conjunctive = false)))
    assert(engine("+spark index") ==
      page(searcher.searchBoolean("spark", "index", K)))
    assert(engine("spark inde*").nonEmpty)
  }

  test("MatchNoDocs and pure-NOT semantics") {
    assert(engine("+zzznothing spark").isEmpty)      // MUST term absent
    assert(engine("+zzzno* spark").isEmpty)          // MUST expansion empty
    assert(engine("-spark").isEmpty)                 // only MUST_NOT
    assert(engine("+\"zzzq unknownterm\" spark").isEmpty) // MUST phrase absent
    // a MUST group dies only when EVERY member is unsatisfiable
    assert(engine("+(zzznothing zzzno*) spark").isEmpty)
    assert(engine("+(zzznothing index) spark").nonEmpty)
  }

  test("explainScore: the breakdown rows sum bit-identically to the " +
    "searchQuery score of a matching doc") {
    val q = "+spark index^2 inde*"
    val hits = engine(q)
    assert(hits.nonEmpty)
    val (topId, topScore) = hits.head
    val rows = searcher.explainScore(q, topId)
      .select("term", "contrib")
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    // rows arrive (term, contrib)-ordered — the exact fold order; the
    // ascending re-sum must reproduce the served score bit-identically
    assert(rows == rows.sorted)
    assert(rows.foldLeft(0.0)(_ + _._2) == topScore)
    // a doc with no contribution explains to an empty frame
    assert(searcher.explainScore("zzznothing", topId).isEmpty)
  }
}
