package graft.pipeline

import graft.functions.graftFunctions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis + on-the-fly BM25 operators over any (id, text) table.
  *
  * These are the relational re-expressions of the engine's query
  * semantics (SURVEY.md §2.4/§2.5) plus the training-data-pipeline text
  * ops (language-ID, quality scoring, token counting, fingerprinting,
  * dedup). Everything is Column-based so Catalyst prunes/pushes/codegens;
  * the only shuffles are the documented groupBys.
  */
object TextOps {

  val K1 = 1.2
  val B = 0.75

  /** (id, term) exploded tokens — the tokenize step shared by everything
    * below. Engine tokenizer (whitespace split + codepoint uppercase). */
  def tokens(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol), explode(qube_tokenize(col(textCol))).as("term"))

  /** (id, term, tf) — S3's tf counting. `qube_tf` (with an empty synonym
    * dictionary) aggregates tf per document MAP-SIDE inside one codegen
    * pass, so no token-stream shuffle exists at all — the previous
    * `explode(tokens).groupBy(id, term)` shipped every token occurrence
    * through an exchange. Row set identical (same tokenizer, same
    * counts). */
  def termFrequencies(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    termFreqWithDl(docs, idCol, textCol).select(idCol, "term", "tf")

  /** (id, term, tf, dl) — the tf stream with the document length riding
    * along from the same `qube_tf` pass (dl is per-doc constant), so
    * consumers that need both never join a separate tokenize pass. */
  private def termFreqWithDl(docs: DataFrame, idCol: String,
                             textCol: String): DataFrame =
    docs.select(col(idCol),
        explode(qube_tf(col(textCol), graft.analysis.SynonymDict.empty))
          .as("__p"))
      .select(col(idCol), col("__p.term").as("term"),
        col("__p.tf").cast("long").as("tf"),
        col("__p.dl").cast("long").as("dl"))

  /** (id, dl) — BM25 field lengths; 0 for token-less docs (`qube_dl`:
    * token count without materializing token strings). */
  def docLengths(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol),
      qube_dl(col(textCol), graft.analysis.SynonymDict.empty)
        .cast("long").as("dl"))

  /** (term, df, ttf) — S10's per-term stats. */
  def termStats(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    termFrequencies(docs, idCol, textCol)
      .groupBy("term").agg(count(lit(1)).as("df"), sum("tf").as("ttf"))

  /** Autocomplete suggestions (the Lucene AnalyzingSuggester analog,
    * on-the-fly twin of [[graft.query.Searcher.suggest]]): dictionary
    * terms starting with the folded prefix, weighted by document
    * frequency (df desc, term asc). */
  def suggestTerms(docs: DataFrame, idCol: String, textCol: String,
                   prefix: String, k: Int): DataFrame = {
    val p = graft.analysis.Tokenizer.foldCase(prefix.trim)
    termStats(docs, idCol, textCol)
      .where(col("term").startsWith(p))
      .orderBy(col("df").desc, col("term").asc)
      .select("term", "df").limit(k)
  }

  /** Spell corrections (the Lucene DirectSpellChecker analog, on-the-fly
    * twin of [[graft.query.Searcher.suggestSpelling]]): dictionary terms
    * within `maxEdits` Levenshtein edits of the folded input (input
    * itself excluded), ranked (dist asc, df desc, term asc). */
  def spellSuggest(docs: DataFrame, idCol: String, textCol: String,
                   term: String, k: Int, maxEdits: Int = 2): DataFrame = {
    val t = graft.analysis.Tokenizer.foldCase(term.trim)
    termStats(docs, idCol, textCol)
      // length-band prefilter: |len(a) − len(b)| ≤ edit distance always,
      // so the band is implied by `dist <= maxEdits` — identical results,
      // but the O(n·m) levenshtein now runs on the few banded rows
      // instead of every dictionary term
      .where(abs(length(col("term")) - lit(t.length)) <= maxEdits)
      .withColumn("dist", levenshtein(col("term"), lit(t)))
      .where(col("dist") <= maxEdits && col("term") =!= t)
      .orderBy(col("dist").asc, col("df").desc, col("term").asc)
      .select("term", "dist", "df").limit(k)
  }

  /** BM25 contribution with the engine's exact arithmetic shape (Q4). */
  def bm25Contrib(tf: Column, dfC: Column, dl: Column, n: Column,
                  avgdl: Column): Column =
    log(lit(1.0) + (n - dfC + lit(0.5)) / (dfC + lit(0.5))) *
      (tf * lit(K1 + 1.0)) /
      (tf + lit(K1) * (lit(1.0 - B) + lit(B) * dl / avgdl))

  /** On-the-fly BM25 top-k over a raw (id, text) table — the whole §3.2
    * query lifecycle as one declarative plan, no prebuilt index. Used by
    * the DuckDB oracle checks; the indexed path lives in
    * [[graft.query.Searcher]]. Deterministic: per-term contributions
    * folded in ascending term order; score rounded to `roundTo` decimals
    * for cross-engine comparison; ties by id asc. */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
               queryTerms: Seq[String], k: Int, conjunctive: Boolean = true,
               filter: Option[Column] = None, roundTo: Int = 4,
               notTerms: Seq[String] = Nil,
               minShouldMatch: Int = 0): DataFrame =
    bm25Scores(docs, idCol, textCol, queryTerms, conjunctive, filter, roundTo,
        notTerms, minShouldMatch)
      .orderBy(col("score").desc, col(idCol).asc)
      .select(idCol, "score").limit(k)

  /** Phrase top-k over a raw (id, text) table: docs where the folded
    * phrase terms occur at consecutive token positions, scored as
    * conjunctive BM25 over the distinct terms — the on-the-fly twin of
    * [[graft.query.Searcher.searchPhrase]] (positional postings), same
    * contract, SQL-replayable for the oracle. */
  def phraseTopK(docs: DataFrame, idCol: String, textCol: String,
                 phrase: Seq[String], k: Int, slop: Int = 0): DataFrame = {
    val terms = phrase.map(graft.analysis.Tokenizer.foldCase)
    // ordered within-slop alignment: positions p_0 < … < p_{m-1} with
    // tokens(p_j) = terms(j) and every gap p_j − p_{j−1} ≤ 1 + slop
    // (per-gap proximity; slop = 0 is exact adjacency — NOT Lucene's
    // total-edit-distance slop, the contract is pinned by the golden
    // model). One native pass (`qube_phrase_match` — the exact DFS
    // transcription of the previous nested-exists HOF cascade, which
    // interpreted a lambda tree per token position).
    val cond = qube_phrase_match(col(textCol), terms, slop)
    bm25TopK(docs, idCol, textCol, terms.distinct, k, conjunctive = true,
      filter = Some(cond))
  }

  /** The full scored match set behind [[bm25TopK]] (no ordering, no
    * limit): hit-metadata aggregates (total, maxScore — Q12) read this
    * directly, so they never plan a top-k heap they don't need. */
  def bm25Scores(docs: DataFrame, idCol: String, textCol: String,
                 queryTerms: Seq[String], conjunctive: Boolean = true,
                 filter: Option[Column] = None, roundTo: Int = 4,
                 notTerms: Seq[String] = Nil,
                 minShouldMatch: Int = 0): DataFrame = {
    val terms = queryTerms.map(graft.analysis.Tokenizer.foldCase).distinct.sorted
    val scored = bm25ScoresSelect(docs, idCol, textCol,
      _.filter(col("term").isin(terms: _*)), filter, roundTo, notTerms,
      boundedTerms = true, pivotTerms = Some(terms))
    if (conjunctive) scored.filter(col("matched") === terms.size)
    else if (minShouldMatch > 0) scored.filter(col("matched") >= minShouldMatch)
    else scored
  }

  /** Scoring core shared by the literal-terms paths and the expansion
    * paths: the scoring term set is whatever `selectTf` keeps of the
    * (id, term, tf) stream — an `isin` filter for user-typed terms, a
    * dictionary predicate for multi-term expansion
    * ([[bm25TopKExpanded]]), a semi-join for more-like-this
    * ([[moreLikeThisTopK]]). Collection stats and df stay GLOBAL — the
    * filter clause matches but never scores and never shifts statistics
    * (reference Q1 semantics, Searcher.java:734-737). Returns
    * (id, matched, score) with NO match-count constraint applied.
    * `boundedTerms` = the caller guarantees the selected term set is
    * O(query) small — only then is the per-term df frame broadcast; an
    * unbounded expansion (leading wildcard, loose fuzzy) must shuffle
    * it, or a big dictionary would be collected onto the driver. */
  private def bm25ScoresSelect(docs: DataFrame, idCol: String, textCol: String,
                               selectTf: DataFrame => DataFrame,
                               filter: Option[Column], roundTo: Int,
                               notTerms: Seq[String],
                               boundedTerms: Boolean,
                               pivotTerms: Option[Seq[String]] = None): DataFrame = {
    // dl rides the tf stream (same qube_tf pass, per-doc constant), so
    // scoring needs NO separate tokenize + dl join; the only full-corpus
    // tokenize besides the tf pass is the one-row stats aggregate
    val tf = termFreqWithDl(docs, idCol, textCol)
    val stats = docLengths(docs, idCol, textCol)
      .agg(count(lit(1)).as("n"), sum("dl").as("sum_dl"))
      .select(col("n"), (col("sum_dl").cast("double") / col("n")).as("avgdl"))
    val qtf = selectTf(tf)
    val dfT0 = qtf.groupBy("term").agg(count(lit(1)).as("df"))
    val dfT = if (boundedTerms) broadcast(dfT0) else dfT0
    val matched0 = qtf
      .join(dfT, Seq("term"))
      .crossJoin(broadcast(stats))
      .withColumn("contrib",
        bm25Contrib(col("tf"), col("df"), col("dl"), col("n"), col("avgdl")))
    val matched1 = filter match {
      case Some(f) => matched0.join(docs.where(f).select(idCol), Seq(idCol), "left_semi")
      case None => matched0
    }
    // MUST_NOT clauses (reference BooleanQuery Occur, Searcher.java:
    // 734-736): docs containing any NOT term are excluded, never scored
    val notFolded = notTerms.map(graft.analysis.Tokenizer.foldCase).distinct
    val matched =
      if (notFolded.isEmpty) matched1
      else matched1.join(
        tf.filter(col("term").isin(notFolded: _*)).select(idCol).distinct(),
        Seq(idCol), "left_anti")
    pivotTerms match {
      case Some(ts) =>
        // plan-time-known term set (every literal-terms query): pivot each
        // term's contribution into a fixed-width column and sum ascending
        // as a column expression — a DECLARATIVE aggregate with map-side
        // partial aggregation (the collect_list shape below ships one
        // (term, contrib) struct per matched (doc, term) through an
        // object-hash aggregate with no partial combine). Bit-identical:
        // contribs are strictly positive finite doubles (idf > 0, tf > 0)
        // and the fold adds them in the SAME ascending term order, so the
        // `+ 0.0` for a missing term is exact — the Searcher.foldPrepared
        // argument, round 5.
        val sortedTerms = ts.distinct.sorted
        val aggs = count(lit(1)).as("matched") +:
          sortedTerms.zipWithIndex.map { case (t, i) =>
            sum(when(col("term") === t, col("contrib"))).as(s"__c$i")
          }
        val total = sortedTerms.indices
          .map(i => coalesce(col(s"__c$i"), lit(0.0d)))
          .reduceOption(_ + _).getOrElse(lit(0.0d))
        matched.groupBy(idCol)
          .agg(aggs.head, aggs.tail: _*)
          .withColumn("score", round(total, roundTo))
          .select(col(idCol), col("matched"), col("score"))
      case None =>
        // expansion paths (prefix/fuzzy/regexp/range/MLT): the term set is
        // data-dependent, so the order-pinned object fold stays
        matched.groupBy(idCol)
          .agg(count(lit(1)).as("matched"),
            sort_array(collect_list(struct(col("term"), col("contrib")))).as("__p"))
          .withColumn("score", round(
            aggregate(col("__p"), lit(0.0d), (acc, x) => acc + x("contrib")), roundTo))
          .select(col(idCol), col("matched"), col("score"))
    }
  }

  /** Multi-term-query expansion over a raw (id, text) table — the
    * PrefixQuery / WildcardQuery / FuzzyQuery analog (Lucene
    * MultiTermQuery under the SCORING_BOOLEAN rewrite, reference core
    * semantics): the scoring terms are every corpus-dictionary term
    * matching `termPred` (a predicate over `col("term")`, e.g.
    * `col("term").startsWith("S")` or
    * `levenshtein(col("term"), lit("PORT")) <= 1`), scored as ONE
    * disjunctive BooleanQuery — each expanded term contributes its own
    * idf. No driver-side term collect: the expansion is a filter on the
    * token stream, so the plan stays fully distributed at any
    * dictionary size. The indexed twin ([[graft.query.Searcher
    * .searchPrefix]]/[[graft.query.Searcher.searchFuzzy]]) resolves the
    * expansion from term_stats instead and caps it at Lucene's
    * maxClauseCount analog. */
  def bm25TopKExpanded(docs: DataFrame, idCol: String, textCol: String,
                       termPred: Column, k: Int,
                       filter: Option[Column] = None,
                       roundTo: Int = 4): DataFrame =
    bm25ScoresSelect(docs, idCol, textCol, _.filter(termPred), filter,
        roundTo, Nil, boundedTerms = false)
      .orderBy(col("score").desc, col(idCol).asc)
      .select(idCol, "score").limit(k)

  /** More-like-this over a raw (id, text) table (Lucene MoreLikeThis
    * analog, golden-model contract): the source doc's terms are ranked
    * by `round(tf · idf, 6)` descending (term ascending on ties — the
    * rounding makes the rank oracle-portable across ln
    * implementations), the top `maxQueryTerms` become one disjunctive
    * BooleanQuery, and the source doc is excluded from the results. */
  def moreLikeThisTopK(docs: DataFrame, idCol: String, textCol: String,
                       sourceId: Long, k: Int, maxQueryTerms: Int = 10,
                       roundTo: Int = 4): DataFrame = {
    val tf = termFrequencies(docs, idCol, textCol)
    val n = docs.agg(count(lit(1)).as("n"))
    val dfAll = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val top = tf.filter(col(idCol) === sourceId)
      .join(dfAll, Seq("term"))
      .crossJoin(broadcast(n))
      .withColumn("w", round(col("tf") * log(lit(1.0) +
        (col("n") - col("df") + lit(0.5)) / (col("df") + lit(0.5))), 6))
      .orderBy(col("w").desc, col("term").asc)
      .limit(maxQueryTerms).select("term")
    bm25ScoresSelect(docs, idCol, textCol,
        _.join(top, Seq("term"), "left_semi"),
        Some(col(idCol) =!= sourceId), roundTo, Nil,
        boundedTerms = true) // ≤ maxQueryTerms terms by construction
      .orderBy(col("score").desc, col(idCol).asc)
      .select(idCol, "score").limit(k)
  }

  /** Snippet generation over the top-k hits (Lucene Highlighter analog,
    * deterministic contract pinned by the golden model): `match_pos` =
    * the FIRST 1-based token position holding any query term;
    * `snippet` = the folded tokens in
    * `[max(1, pos − window), min(len, pos + window)]` joined by single
    * spaces. Hits are the disjunctive BM25 top-k of the query terms, so
    * every hit has a match position by construction. */
  def highlightTopK(docs: DataFrame, idCol: String, textCol: String,
                    queryTerms: Seq[String], k: Int,
                    window: Int = 2): DataFrame = {
    require(window >= 0, s"window must be >= 0, got $window")
    val terms =
      queryTerms.map(graft.analysis.Tokenizer.foldCase).distinct.sorted
    val hits = bm25TopK(docs, idCol, textCol, terms, k, conjunctive = false)
    val toks = qube_tokenize(col(textCol))
    // try_element_at defensively (a hit always matches by construction,
    // but a null/empty text must null out, not throw)
    val pos = try_element_at(
      filter(sequence(lit(1), greatest(size(toks), lit(1))),
        i => coalesce(try_element_at(toks, i).isin(terms: _*), lit(false))),
      lit(1))
    // join FIRST, tokenize after: match_pos/snippet evaluate on the ≤ k
    // hit rows only (Catalyst prunes columns below a join but never
    // pushes computed projections down), never O(corpus tokens)
    hits.join(docs.select(col(idCol), col(textCol)), Seq(idCol))
      .select(col(idCol), col("score"), toks.as("__toks"), pos.as("__pos"))
      .withColumn("__lo", greatest(lit(1), col("__pos") - window))
      .withColumn("__hi", least(size(col("__toks")), col("__pos") + window))
      .select(col(idCol), col("score"),
        col("__pos").cast("long").as("match_pos"),
        array_join(
          slice(col("__toks"), col("__lo"), col("__hi") - col("__lo") + 1),
          " ").as("snippet"))
      .orderBy(col("score").desc, col(idCol).asc)
  }

  // --- training-data text analysis -----------------------------------

  private val enStop = Seq("THE", "A", "OF", "TO", "AND", "IN", "IS")
  private val deStop = Seq("DER", "DIE", "DAS", "UND", "IST", "EIN")
  private val esStop = Seq("EL", "LA", "DE", "QUE", "Y", "UN")

  /** Language-ID by stopword-hit heuristic (n-gram-free deterministic
    * variant; SQL-expressible so the DuckDB oracle can replay it). */
  def langId(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    // per-doc native counting (one tokenize pass, three set probes per
    // token) instead of explode + groupBy — the old shape shuffled the
    // whole token stream to count stopword hits. Row set identical: the
    // groupBy emitted one row per doc WITH tokens, so token-less docs
    // stay excluded (the `qube_dl > 0` guard — a codepoint walk, no
    // token materialization).
    docs
      .where(qube_dl(col(textCol), graft.analysis.SynonymDict.empty) > 0)
      .select(col(idCol),
        qube_set_hits(col(textCol), Seq(enStop, deStop, esStop)).as("__h"))
      .select(col(idCol),
        element_at(col("__h"), 1).as("en_hits"),
        element_at(col("__h"), 2).as("de_hits"),
        element_at(col("__h"), 3).as("es_hits"))
      .withColumn("lang_pred",
        when(col("en_hits") >= col("de_hits") && col("en_hits") >= col("es_hits"), "en")
          .when(col("de_hits") >= col("es_hits"), "de")
          .otherwise("es"))
  }

  /** Quality features: token count, punctuation ratio, stopword ratio,
    * mean token length, composite score — length/punct/stopword shape. */
  def qualityScore(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    val nTokens = size(qube_tokenize(t)).cast("double")
    val nChars = length(t).cast("double")
    val punct = (length(t) - length(regexp_replace(t, "[^a-zA-Z0-9 ]", ""))).cast("double")
    // stopword ratio per doc from one native set-hit pass — the old
    // shape exploded the token stream, shuffled it into a groupBy and
    // joined back. Same values: hits/count over the same tokens, and
    // token-less docs take the joined-null → 0.0 fill both ways.
    val swHits = element_at(
      qube_set_hits(t, Seq(enStop)), 1).cast("double")
    docs.select(
        col(idCol),
        nTokens.as("n_tokens"),
        round(punct / greatest(nChars, lit(1.0)), 4).as("punct_ratio"),
        round(nChars / greatest(nTokens, lit(1.0)), 4).as("chars_per_token"),
        when(nTokens > 0, round(swHits / nTokens, 4))
          .otherwise(0.0).as("stopword_ratio"))
      .withColumn("quality", round(
        lit(0.5) * least(col("n_tokens") / lit(100.0), lit(1.0)) +
          lit(0.5) * (lit(1.0) - col("punct_ratio")), 4))
  }

  /** Token counting: whitespace tokens + a BPE-ish regex token count. */
  def tokenCounts(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol),
      size(qube_tokenize(col(textCol))).cast("long").as("ws_tokens"),
      size(regexp_extract_all(col(textCol),
        lit("[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"), lit(0))).cast("long").as("re_tokens"))

  /** Document fingerprint: md5 of the case-folded text (canonical content
    * hash) — the exact-dedup key. */
  def fingerprint(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol), md5(upper(trim(col(textCol)))).as("fp"))

  /** Exact dedup by content hash: keep the smallest id per fingerprint
    * (hash-groupBy — one shuffle, fully parallel). */
  def dedupExact(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    fingerprint(docs, idCol, textCol)
      .groupBy("fp").agg(min(idCol).as("keep_id"), count(lit(1)).as("n_dupes"))

  /** (id, shingle) distinct token n-gram shingles — one native pass
    * (`qube_shingles` dedups per doc, which IS the old global distinct's
    * row set since shingle rows carry the doc id), zero shuffles. */
  def shingles(docs: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    docs.select(col(idCol),
      explode(qube_shingles(col(textCol), n)).as("shingle"))

  /** Exact n-gram Jaccard near-dup pairs ≥ threshold: shingle self-join
    * (id_a < id_b), |∩| from the join, |∪| = |A|+|B|−|∩|. Quadratic in
    * bucket size — the exact baseline; [[minhashLsh]] is the scale path. */
  def ngramJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
                        n: Int, threshold: Double): DataFrame = {
    val sh = shingles(docs, idCol, textCol, n)
    val sizes = sh.groupBy(idCol).agg(count(lit(1)).as("sz"))
    val a = sh.select(col(idCol).as("id_a"), col("shingle"))
    val b = sh.select(col(idCol).as("id_b"), col("shingle"))
    a.join(b, Seq("shingle")).where(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("inter"))
      .join(sizes.select(col(idCol).as("id_a"), col("sz").as("sz_a")), Seq("id_a"))
      .join(sizes.select(col(idCol).as("id_b"), col("sz").as("sz_b")), Seq("id_b"))
      .withColumn("jaccard", round(col("inter").cast("double") /
        (col("sz_a") + col("sz_b") - col("inter")), 4))
      .where(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  // --- sketch-based near-dup (scale path; per-row, shuffle-free until
  //     the band-bucket join) ------------------------------------------

  // Mersenne prime 2^31-1: with a,b,h all < 2^31, a*h+b < 2^62 — no Long
  // overflow, so (a*h+b) mod p is a true universal hash (a 2^61 prime
  // with 32-bit h overflows Long and silently destroys uniformity)
  val MinhashPrime = 2147483647L
  val SimhashPrime2 = 2147483629L // second 31-bit prime for the 62-bit hash

  /** Horner polynomial hash over codepoints mod a 31-bit prime — the
    * portable string hash shared with the DuckDB oracle (`list_reduce`
    * over `unicode(s[i])` with the same recurrence), so every sketch
    * built on it (MinHash, SimHash) is SQL-replayable cross-engine.
    * acc < p < 2^31 and cp ≤ 0x10FFFF keep acc·base + cp < 2^63. */
  def polyHash(s: String, base: Long, p: Long): Long = {
    var h = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      h = (h * base + cp) % p
      i += Character.charCount(cp)
    }
    h
  }

  /** k MinHash values per doc from its shingle set. Per-row computation
    * (no shuffle); signatures verified in tests against exact Jaccard. */
  def minhashSignatures(docs: DataFrame, idCol: String, textCol: String,
                        n: Int, k: Int): DataFrame = {
    // permutation constants hoisted out of the UDF (they are pure
    // functions of the index); the per-row body runs primitive loops —
    // identical values to the original sliding/Set/map formulation,
    // without the per-shingle Seq/String-churn (distinct-shingle hashes
    // dedup via a primitive-friendly HashSet, min computed in place)
    val as = Array.tabulate(k)(i => permConst(i * 2))
    val bs = Array.tabulate(k)(i => permConst(i * 2 + 1))
    val sigUdf = udf { toks: Seq[String] =>
      val t = toks.toArray
      if (t.length < n) Array.fill(k)(Long.MaxValue)
      else {
        val seen = new java.util.HashSet[String]()
        val out = Array.fill(k)(Long.MaxValue)
        val sb = new java.lang.StringBuilder()
        var i = 0
        var any = false
        while (i <= t.length - n) {
          sb.setLength(0)
          var j = 0
          while (j < n) {
            if (j > 0) sb.append(' ')
            sb.append(t(i + j))
            j += 1
          }
          val s = sb.toString
          if (seen.add(s)) {
            any = true
            val h = polyHash(s, 31L, MinhashPrime)
            var p = 0
            while (p < k) {
              val v = (as(p) * h + bs(p)) % MinhashPrime
              if (v < out(p)) out(p) = v
              p += 1
            }
          }
          i += 1
        }
        if (!any) Array.fill(k)(Long.MaxValue) else out
      }
    }
    docs.select(col(idCol), sigUdf(qube_tokenize(col(textCol))).as("sig"))
  }

  // deterministic permutation constants (seeded), in [1, p-1]
  def permConst(i: Int): Long = {
    val rnd = new scala.util.Random(9876543210L + i)
    math.abs(rnd.nextLong()) % (MinhashPrime - 1) + 1
  }

  /** MinHash + LSH banding: explode signature into (band, bandHash)
    * buckets, join within buckets for candidate pairs, verify with exact
    * Jaccard. shingle→minhash→band→bucket-join, the standard web-dedup
    * pipeline shape. */
  def minhashLsh(docs: DataFrame, idCol: String, textCol: String,
                 n: Int = 3, k: Int = 32, bands: Int = 8,
                 verifyThreshold: Double = 0.5): DataFrame = {
    require(k % bands == 0)
    val rows = k / bands
    val sigs = minhashSignatures(docs, idCol, textCol, n, k)
    // the band KEY is the signature slice itself, not a hash of it: a
    // band-hash collision would admit a candidate pair by accident, and
    // the DuckDB oracle (which compares slices exactly) could never
    // reproduce it — array join keys group/hash fine in Spark
    val banded = sigs.select(col(idCol), posexplode(
        transform(sequence(lit(0), lit(bands - 1)),
          bIdx => slice(col("sig"), bIdx * rows + 1, lit(rows)))))
      .toDF(idCol, "band", "band_key")
    val a = banded.select(col(idCol).as("id_a"), col("band"), col("band_key"))
    val b = banded.select(col(idCol).as("id_b"), col("band"), col("band_key"))
    val candidates = a.join(b, Seq("band", "band_key"))
      .where(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    // verify candidates with exact jaccard computed ONLY over candidate
    // docs: shingles are semi-joined to the candidate id set first, so
    // the verification pair join is candidate-local — never the all-pairs
    // join (which would be quadratic in corpus size at 10^12 docs)
    val candIds = candidates.select(col("id_a").as(idCol))
      .union(candidates.select(col("id_b").as(idCol))).distinct()
    // semi-join the DOCS, not the exploded shingles: the id restriction
    // commutes with the per-row explode, and filtering first keeps the
    // shingle pass O(candidate docs) instead of re-shingling the corpus
    val sh = shingles(docs.join(candIds, Seq(idCol), "left_semi"),
      idCol, textCol, n)
    val sizes = sh.groupBy(idCol).agg(count(lit(1)).as("sz"))
    val sa = sh.select(col(idCol).as("id_a"), col("shingle"))
    val sb = sh.select(col(idCol).as("id_b"), col("shingle"))
    sa.join(sb, Seq("shingle")).where(col("id_a") < col("id_b"))
      .join(candidates, Seq("id_a", "id_b"), "left_semi")
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("inter"))
      .join(sizes.select(col(idCol).as("id_a"), col("sz").as("sz_a")), Seq("id_a"))
      .join(sizes.select(col(idCol).as("id_b"), col("sz").as("sz_b")), Seq("id_b"))
      .withColumn("jaccard", round(col("inter").cast("double") /
        (col("sz_a") + col("sz_b") - col("inter")), 4))
      .where(col("jaccard") >= verifyThreshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** 62-bit SimHash per doc (per-row, shuffle-free): tf-weighted sign sum
    * over term hash bits. The term hash is two [[polyHash]] lanes packed
    * as `h1·2^31 + h2` — 62 bits so the value is always a non-negative
    * BIGINT, and every step (hash, bit test, weighted sum, bit pack) is
    * exactly replayable by the DuckDB oracle in integer SQL. */
  val SimhashBits = 62
  def simhash64(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val simUdf = udf { toks: Seq[String] =>
      // tf count via a primitive-int map instead of groupBy(identity)'s
      // Map[String, Seq[String]] materialization — identical weights
      val counts = new java.util.HashMap[String, Integer]()
      toks.foreach(t => counts.merge(t, 1,
        (a: Integer, b: Integer) => Integer.valueOf(a + b)))
      val acc = new Array[Int](SimhashBits)
      val it = counts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val t = e.getKey
        val h = polyHash(t, 31L, MinhashPrime) * 2147483648L +
          polyHash(t, 37L, SimhashPrime2)
        val w = e.getValue
        var j = 0
        while (j < SimhashBits) {
          if (((h >>> j) & 1L) == 1L) acc(j) += w else acc(j) -= w
          j += 1
        }
      }
      var out = 0L
      var j = 0
      while (j < SimhashBits) { if (acc(j) > 0) out |= (1L << j); j += 1 }
      out
    }
    docs.select(col(idCol), simUdf(qube_tokenize(col(textCol))).as("simhash"))
  }

  /** Near-dup pairs by SimHash Hamming distance ≤ maxDist, bucketed by
    * 16-bit chunks (a pair within distance ≤3 shares at least one of 4
    * chunks — pigeonhole), so the join is bucket-local, not all-pairs. */
  def simhashPairs(docs: DataFrame, idCol: String, textCol: String,
                   maxDist: Int = 3): DataFrame = {
    val sh = simhash64(docs, idCol, textCol)
    val chunks = array((0 until 4).map(i =>
      struct(lit(i).as("chunk_idx"),
        shiftrightunsigned(col("simhash"), i * 16)
          .bitwiseAND(lit(0xFFFFL)).as("chunk"))): _*)
    val chunked = sh.select(col(idCol), col("simhash"), explode(chunks).as("c"))
      .select(col(idCol), col("simhash"),
        col("c.chunk_idx").as("chunk_idx"), col("c.chunk").as("chunk"))
    val a = chunked.select(col(idCol).as("id_a"), col("simhash").as("sh_a"),
      col("chunk_idx"), col("chunk"))
    val b = chunked.select(col(idCol).as("id_b"), col("simhash").as("sh_b"),
      col("chunk_idx"), col("chunk"))
    a.join(b, Seq("chunk_idx", "chunk")).where(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "sh_a", "sh_b").distinct()
      .withColumn("hamming", bit_count(col("sh_a").bitwiseXOR(col("sh_b"))))
      .where(col("hamming") <= maxDist)
      .select("id_a", "id_b", "hamming")
  }

  /** Collapse near-duplicate PAIRS into components: (id, keep_id) where
    * keep_id is the component's smallest id — the "keep one
    * representative, drop the rest" step of web-scale dedup, applicable
    * to any pair source (MinHash, SimHash, embedding-cosine).
    *
    * Iterative min-label propagation over the symmetric edge set, with a
    * POINTER-DOUBLING step per round (follow the label's label — the
    * distributed path-halving of large-star/small-star contraction): a
    * component of diameter D converges in O(log D) rounds instead of
    * O(D), so an adversarial 10^6-long chain fits the same round budget
    * as the typical tiny dup cluster. Each round is two equi-joins + one
    * min-agg shuffle; the label frame is localCheckpointed so the plan
    * never grows with iterations. Labels only decrease and are bounded
    * below by the component minimum, so the fixpoint IS the transitive
    * closure. */
  def nearDupComponents(ids: DataFrame, idCol: String,
                        pairs: DataFrame, maxIters: Int = 25): DataFrame = {
    val edges = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
      .union(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
      .localCheckpoint(true)
    var labels = ids
      .select(col(idCol).cast("long").as("id"),
        col(idCol).cast("long").as("keep_id"))
      .localCheckpoint(true)
    var iter = 0
    var changed = true
    while (changed && iter < maxIters) {
      // each union leg tags whether the row is the node's OWN prior label
      // (exactly one per id) so the old label rides through the min-agg —
      // change detection then folds into the checkpoint job as an
      // observed metric instead of a separate join + count job per round
      val prop = labels.join(edges, labels("id") === edges("src"))
        .select(col("dst").as("id"), col("keep_id"), lit(false).as("__own"))
      val combined = labels.withColumn("__own", lit(true)).union(prop)
        .groupBy("id")
        .agg(min("keep_id").as("keep_id"),
          min(when(col("__own"), col("keep_id"))).as("__old"))
      // pointer doubling: keep_id := keep_id's keep_id (every keep_id is
      // itself a node id, so the inner join is total); monotone because
      // the followed label is never larger
      val obs = org.apache.spark.sql.Observation()
      val next = combined
        .join(combined.select(col("id").as("__kid"),
          col("keep_id").as("__kk")), col("keep_id") === col("__kid"))
        .select(col("id"), col("__kk").as("keep_id"), col("__old"))
        .observe(obs, sum(when(col("keep_id") < col("__old"), 1L)
          .otherwise(0L)).as("__changed"))
        .select(col("id"), col("keep_id"))
        .localCheckpoint(true)
      changed = obs.get("__changed").asInstanceOf[Long] > 0
      labels = next
      iter += 1
    }
    // partial labels would silently diverge from the transitive closure —
    // a graph that somehow outruns the log-round budget must fail loudly
    require(!changed, s"nearDupComponents did not converge in $maxIters " +
      "rounds — raise maxIters")
    labels
  }

  /** Top-n rows per group by ordering columns — the window-rank shape the
    * engine uses for facet paging (SURVEY.md §2.9). */
  def topNPerGroup(df: DataFrame, groupCols: Seq[String],
                   order: Seq[Column], n: Int): DataFrame = {
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy(order: _*)
    df.withColumn("rn", row_number().over(w)).where(col("rn") <= n)
  }
}
