package graft.functions

import graft.analysis.{SynonymDict, TextExtract, Tokenizer}
import graft.codec.VarByte
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** Catalyst-typed static entry points shared by interpreted `nullSafeEval`
  * and generated (whole-stage codegen) code. Scala `object` methods get
  * static forwarders, so generated Java calls
  * `graft.functions.GraftRuntime.m(...)` directly. */
object GraftRuntime {

  def extractText(html: Array[Byte]): UTF8String =
    UTF8String.fromString(TextExtract.extractText(html))

  def tokenize(text: UTF8String): ArrayData = tokenize(text, Tokenizer.Text)

  def tokenize(text: UTF8String, mode: String): ArrayData = {
    val toks = Tokenizer.tokenize(text.toString, mode)
    val out = new Array[Any](toks.length)
    var i = 0
    while (i < toks.length) { out(i) = UTF8String.fromString(toks(i)); i += 1 }
    new GenericArrayData(out)
  }

  def normalizeSortKey(s: UTF8String): UTF8String =
    UTF8String.fromString(Tokenizer.normalizeSortKey(s.toString))

  /** text → ARRAY<STRUCT<term STRING, tf INT, dl INT>>: tokenize + synonym
    * expand + per-doc tf count + field length, in ONE pass with no
    * UDF/encoder round-trips — the index build's hot inner loop. `dl`
    * (identical on every struct of a row) rides along so downstream needs
    * no second pass over the array. Term order = first occurrence
    * (deterministic; irrelevant to the sorted posting layout). */
  def tfPairs(dict: SynonymDict, text: UTF8String): ArrayData =
    tfPairs(dict, text, Tokenizer.Text)

  def tfPairs(dict: SynonymDict, text: UTF8String, mode: String): ArrayData = {
    val toks = Tokenizer.tokenize(text.toString, mode)
    val expanded: Seq[String] =
      if (dict.isEmpty) scala.collection.immutable.ArraySeq.unsafeWrapArray(toks)
      else dict.expand(scala.collection.immutable.ArraySeq.unsafeWrapArray(toks))
    val dl = expanded.length
    if (dl == 0) return new GenericArrayData(new Array[Any](0))
    // open-addressing tf count (linear probing, power-of-two capacity):
    // the LinkedHashMap formulation boxed an Integer per token put —
    // measured as the dominant term of this hot loop (build passes run
    // it once per doc per pass). Same output: first-occurrence term
    // order via the `order` slots, identical counts.
    val cap = Integer.highestOneBit(math.max(4, dl * 2 - 1)) * 2
    val mask = cap - 1
    val keys = new Array[String](cap)
    val counts = new Array[Int](cap)
    val order = new Array[Int](dl)
    var uniq = 0
    val it0 = expanded.iterator
    while (it0.hasNext) {
      val t = it0.next()
      var h = t.hashCode & mask
      while (keys(h) != null && !keys(h).equals(t)) h = (h + 1) & mask
      if (keys(h) == null) { keys(h) = t; order(uniq) = h; uniq += 1 }
      counts(h) += 1
    }
    val out = new Array[Any](uniq)
    var i = 0
    while (i < uniq) {
      val slot = order(i)
      out(i) = InternalRow(UTF8String.fromString(keys(slot)), counts(slot), dl)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** text → dl (post-expansion token count) WITHOUT materializing the
    * per-term tf map — the docstore pass needs ONLY dl, and building the
    * LinkedHashMap + struct array per doc just to read its length was
    * measurable build-phase cost. With no synonym dictionary the count
    * needs no token strings at all (a codepoint walk counting separator
    * transitions); with one, expansion can change the count in ways only
    * `SynonymDict.expand` knows, so the tokens materialize and expand
    * exactly as [[tfPairs]] does. Identity `docLen == tfPairs(...).dl`
    * is pinned by ExpressionsSpec. */
  def docLen(dict: SynonymDict, text: UTF8String, mode: String): Int =
    if (!dict.isEmpty)
      dict.expand(scala.collection.immutable.ArraySeq.unsafeWrapArray(
        Tokenizer.tokenize(text.toString, mode))).length
    else {
      val s = text.toString
      val keyword = mode == Tokenizer.Keyword
      require(keyword || mode == Tokenizer.Text,
        s"unknown analyzer mode '$mode'")
      var count = 0
      var inTok = false
      var i = 0
      val n = s.length
      while (i < n) {
        val cp = s.codePointAt(i)
        val isSep =
          if (keyword) !Character.isLetterOrDigit(cp)
          else Character.isWhitespace(cp)
        if (isSep) inTok = false
        else if (!inTok) { count += 1; inTok = true }
        i += Character.charCount(cp)
      }
      count
    }

  /** text → ARRAY<STRUCT<term, tf, dl, positions ARRAY<INT>>>: the
    * positional twin of [[tfPairs]] for builds with `indexPositions`.
    * `positions` are the term's 0-based indexes in the post-expansion
    * token stream — the position contract shared with the golden model
    * (phrase = consecutive positions; reference indexes
    * DOCS_AND_FREQS_AND_POSITIONS, Indexer.java:713-714). */
  def tfPairsPos(dict: SynonymDict, text: UTF8String): ArrayData =
    tfPairsPos(dict, text, Tokenizer.Text)

  def tfPairsPos(dict: SynonymDict, text: UTF8String, mode: String): ArrayData = {
    val toks = Tokenizer.tokenize(text.toString, mode)
    val expanded: Seq[String] =
      if (dict.isEmpty) scala.collection.immutable.ArraySeq.unsafeWrapArray(toks)
      else dict.expand(scala.collection.immutable.ArraySeq.unsafeWrapArray(toks))
    val dl = expanded.length
    if (dl == 0) return new GenericArrayData(new Array[Any](0))
    // same open-addressing shape as [[tfPairs]], with an IntVec of
    // positions per slot instead of a count
    val cap = Integer.highestOneBit(math.max(4, dl * 2 - 1)) * 2
    val mask = cap - 1
    val keys = new Array[String](cap)
    val poss = new Array[IntVec](cap)
    val order = new Array[Int](dl)
    var uniq = 0
    var p = 0
    val it0 = expanded.iterator
    while (it0.hasNext) {
      val t = it0.next()
      var h = t.hashCode & mask
      while (keys(h) != null && !keys(h).equals(t)) h = (h + 1) & mask
      if (keys(h) == null) {
        keys(h) = t; poss(h) = new IntVec(); order(uniq) = h; uniq += 1
      }
      poss(h).add(p)
      p += 1
    }
    val out = new Array[Any](uniq)
    var i = 0
    while (i < uniq) {
      val slot = order(i)
      val ps = poss(slot)
      out(i) = InternalRow(UTF8String.fromString(keys(slot)), ps.size, dl,
        new GenericArrayData(ps.toArray))
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Growable int list for position accumulation (avoids boxing churn in
    * the build hot loop). */
  final class IntVec {
    private var a = new Array[Int](4)
    private var n = 0
    def add(v: Int): Unit = {
      if (n == a.length) a = java.util.Arrays.copyOf(a, n * 2)
      a(n) = v; n += 1
    }
    def size: Int = n
    def toArray: Array[Any] = {
      val out = new Array[Any](n)
      var i = 0
      while (i < n) { out(i) = a(i); i += 1 }
      out
    }
    def toInts: Array[Int] = java.util.Arrays.copyOf(a, n)
  }

  /** Cosine similarity of two equal-length double arrays: dp, |a|², |b|²
    * accumulated in index order in one pass — value-identical to the
    * fold-based `aggregate(zip_with(...))` formulation but ~50 ns instead
    * of ~4 µs (the HOF tree is interpreted per element; at 10^6 candidate
    * pairs per task that difference IS the query's runtime). */
  def vecCosine(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    require(n == b.numElements(),
      s"vec_cosine: length mismatch ${n} vs ${b.numElements()}")
    var dp = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getDouble(i)
      val y = b.getDouble(i)
      dp += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    dp / (java.lang.Math.sqrt(na) * java.lang.Math.sqrt(nb))
  }

  /** text → DISTINCT token n-gram shingles (space-joined, tokenizer
    * uppercase fold) in one native pass. Per-doc dedup here replaces the
    * global `(id, shingle)` distinct() — identical row set (shingle rows
    * never collide across docs because the id rides along), one whole
    * shuffle cheaper, and no interpreted slice/concat_ws HOF tree per
    * shingle. */
  def shingles(text: UTF8String, n: Int): ArrayData = {
    val toks = Tokenizer.tokenize(text.toString, Tokenizer.Text)
    if (toks.length < n) return new GenericArrayData(new Array[Any](0))
    val seen = new java.util.LinkedHashSet[String]()
    val sb = new java.lang.StringBuilder()
    var i = 0
    while (i <= toks.length - n) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = UTF8String.fromString(it.next()); k += 1 }
    new GenericArrayData(out)
  }

  /** Ordered within-slop phrase match over the tokenized text — the
    * native twin of the nested-`exists` HOF cascade in
    * [[graft.pipeline.TextOps.phraseTopK]]: positions p_0 < … < p_{m−1}
    * with tokens(p_j) = terms(j) and every gap p_j − p_{j−1} ∈
    * [1, 1+slop]. Exact DFS transcription of the `from(j, prev)`
    * recursion (same search order, same early-true), so the match set is
    * identical by construction. */
  def phraseMatch(text: UTF8String, terms: Array[String],
                  slop: Int): Boolean = {
    val toks = Tokenizer.tokenize(text.toString, Tokenizer.Text)
    val m = terms.length
    val n = toks.length
    if (m == 0 || n < m) return false
    def from(j: Int, prev: Int): Boolean = { // 1-based positions
      if (j == m) return true
      var p = prev + 1
      val hi = prev + 1 + slop
      while (p <= hi) {
        if (p <= n && toks(p - 1) == terms(j) && from(j + 1, p)) return true
        p += 1
      }
      false
    }
    var i = 1
    val lim = n - (m - 1)
    while (i <= lim) {
      if (toks(i - 1) == terms(0) && from(1, i)) return true
      i += 1
    }
    false
  }

  /** Per-set token-occurrence counts in ONE tokenize pass — the native
    * replacement for `explode(tokens).groupBy(id).agg(sum(when(isin)))`
    * shapes (langId / qualityScore), which shuffled the token stream
    * just to count stopword hits per doc. */
  def setHits(text: UTF8String,
              sets: Array[java.util.HashSet[String]]): ArrayData = {
    val toks = Tokenizer.tokenize(text.toString, Tokenizer.Text)
    val out = new Array[Any](sets.length)
    var s = 0
    while (s < sets.length) {
      val set = sets(s)
      var hits = 0L
      var i = 0
      while (i < toks.length) {
        if (set.contains(toks(i))) hits += 1
        i += 1
      }
      out(s) = hits
      s += 1
    }
    new GenericArrayData(out)
  }

  /** One sign-LSH bucket per seed — the `transform(aggregate(...))` HOF
    * tree as a native loop. Arithmetic identical to the HOF formulation:
    * per seed, fold planes as `acc·2 + (dot ≥ 0 ? 1 : 0)` with each dot
    * an index-ordered Σ x·y from 0.0. */
  def lshBucketsPerSeed(v: ArrayData,
                        planesBySeed: Array[Array[Array[Double]]]): ArrayData = {
    val n = v.numElements()
    val out = new Array[Any](planesBySeed.length)
    var s = 0
    while (s < planesBySeed.length) {
      val planes = planesBySeed(s)
      var acc = 0L
      var p = 0
      while (p < planes.length) {
        val plane = planes(p)
        // mirror zip_with's length semantics: equal dims in practice
        // (planes are generated at the embedding dim); require loudly
        // rather than silently truncating
        require(n == plane.length,
          s"lsh_buckets: dim mismatch $n vs ${plane.length}")
        var d = 0.0
        var i = 0
        while (i < n) { d += v.getDouble(i) * plane(i); i += 1 }
        acc = acc * 2 + (if (d >= 0) 1L else 0L)
        p += 1
      }
      out(s) = acc
      s += 1
    }
    new GenericArrayData(out)
  }

  /** Nearest-centroid index by squared L2 — the IVF coarse-quantizer
    * assignment as one native loop instead of an interpreted
    * `aggregate(zip_with(...))` HOF tree per centroid (k × dim boxed
    * lambda evaluations per row). Arithmetic is IDENTICAL to the HOF
    * formulation: per centroid, Σ (x−y)² accumulated in index order from
    * 0.0; argmin by strict `<` so the first minimum wins — the
    * `foldLeft(when(d < best.d, ...))` contract. */
  def vecNearestCentroid(v: ArrayData, cents: Array[Array[Double]]): Int = {
    var bestI = 0
    var bestD = l2sq(v, cents(0))
    var i = 1
    while (i < cents.length) {
      val d = l2sq(v, cents(i))
      if (d < bestD) { bestD = d; bestI = i }
      i += 1
    }
    bestI
  }

  private def l2sq(v: ArrayData, c: Array[Double]): Double = {
    val n = v.numElements()
    require(n == c.length,
      s"vec_nearest_centroid: length mismatch $n vs ${c.length}")
    var acc = 0.0
    var i = 0
    while (i < n) {
      val d = v.getDouble(i) - c(i)
      acc += d * d
      i += 1
    }
    acc
  }

  /** blob → ARRAY<STRUCT<doc_id BIGINT, tf INT, dl INT>> */
  def vbDecode(blob: Array[Byte]): ArrayData = {
    val (docIds, tfs, dls) = VarByte.decode(blob)
    val out = new Array[Any](docIds.length)
    var i = 0
    while (i < docIds.length) {
      out(i) = InternalRow(docIds(i), tfs(i), dls(i))
      i += 1
    }
    new GenericArrayData(out)
  }

  /** blob → ARRAY<STRUCT<doc_id, tf, dl, positions ARRAY<INT>>> — the
    * positional decode for the phrase path, as a columnar expression so
    * the decode stays inside codegen instead of a Dataset flatMap
    * (tuple-encoder round-trip per posting). */
  def vbDecodePos(blob: Array[Byte]): ArrayData = {
    val (docIds, tfs, dls, poss) = VarByte.decodeWithPositions(blob)
    val out = new Array[Any](docIds.length)
    var i = 0
    while (i < docIds.length) {
      val ps = poss(i)
      val arr = new Array[Any](if (ps == null) 0 else ps.length)
      var j = 0
      while (j < arr.length) { arr(j) = ps(j); j += 1 }
      out(i) = InternalRow(docIds(i), tfs(i), dls(i), new GenericArrayData(arr))
      i += 1
    }
    new GenericArrayData(out)
  }
}
