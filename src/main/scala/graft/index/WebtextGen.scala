package graft.index

import java.nio.charset.StandardCharsets
import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic Common-Crawl-style page generator (FIXTURES.md §1, the
  * input_hint shape): `(url STRING, warc_ts TIMESTAMP, html BINARY,
  * text STRING, lang STRING)`.
  *
  * Purity: every page is a pure function of (seed, i) — generation is
  * identical no matter how Spark partitions the id range, so two builds
  * over the same (seed, n) are byte-identical (the determinism the north
  * rule demands). Bodies draw 20–200 tokens Zipf(s≈1.07) from a 10,000
  * word vocabulary, which guarantees head-term skew (exercises salting).
  * `text` is the pre-extracted text for even ids (byte-equal to
  * `extract_text(html)`) and NULL for odd ids (forces the extraction
  * path).
  */
object WebtextGen {

  final case class Page(url: String, warc_ts: Timestamp, html: Array[Byte],
                        text: String, lang: String)

  val VocabSize = 10000

  /** Head of the vocabulary: real words so reference queries and synonym
    * fixtures read naturally; tail is synthetic. Zipf rank order = array
    * order, so `spark` is the most frequent term. */
  private val headWords: Array[String] = Array(
    "spark", "index", "search", "data", "query", "engine", "scala",
    "lucene", "term", "document", "page", "web", "crawl", "text", "token",
    "score", "rank", "filter", "sort", "facet", "merge", "segment",
    "shard", "nike", "shoes", "adidas", "run", "fast", "slow", "big",
    "small", "join", "group", "count", "batch", "stream", "table", "row",
    "column", "cache", "disk", "memory", "cluster", "node", "driver",
    "executor", "partition", "shuffle", "skew", "salt", "hash", "tree",
    "graph", "list", "map", "set", "key", "value", "byte", "word")

  val vocabulary: Array[String] =
    Array.tabulate(VocabSize)(i =>
      if (i < headWords.length) headWords(i) else s"w${i}")

  /** Zipf(s) cumulative distribution over vocabulary ranks. */
  private val zipfS = 1.07
  private val zipfCum: Array[Double] = {
    val w = Array.tabulate(VocabSize)(i => 1.0 / math.pow(i + 1.0, zipfS))
    val total = w.sum
    val cum = new Array[Double](VocabSize)
    var acc = 0.0
    var i = 0
    while (i < VocabSize) { acc += w(i) / total; cum(i) = acc; i += 1 }
    cum(VocabSize - 1) = 1.0
    cum
  }

  /** Bucket index over the monotone CDF: bucket b holds the first rank
    * whose cum ≥ b/4096, so a draw's binary search runs over the 0-30
    * ranks its bucket can reach instead of all 10,000 (~13 iterations →
    * ~2, and a page draws ~220 times). The ±1-bucket widening makes the
    * bracket immune to the ≤1-ulp rounding of `u * 4096` (drift is
    * ~4e-13 buckets); [[zipfPickRef]] + WebtextGenSpec pin bucketed ≡
    * plain over randomized draws and the golden corpus CRCs. */
  private val ZipfBuckets = 4096
  private val zipfBucketLo: Array[Int] = {
    val lo = new Array[Int](ZipfBuckets)
    var idx = 0
    var b = 0
    while (b < ZipfBuckets) {
      while (idx < VocabSize - 1 && zipfCum(idx) < b.toDouble / ZipfBuckets)
        idx += 1
      lo(b) = idx
      b += 1
    }
    lo
  }

  private def zipfPick(u: Double): String = {
    val b = (u * ZipfBuckets).toInt
    var lo = zipfBucketLo(if (b <= 0) 0 else b - 1)
    var hi =
      if (b >= ZipfBuckets - 2) VocabSize - 1 else zipfBucketLo(b + 2)
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (zipfCum(mid) < u) lo = mid + 1 else hi = mid
    }
    vocabulary(lo)
  }

  /** The original full-range binary search — kept as the equivalence
    * reference for the bucketed [[zipfPick]]. */
  private[index] def zipfPickRef(u: Double): String = {
    var lo = 0
    var hi = VocabSize - 1
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (zipfCum(mid) < u) lo = mid + 1 else hi = mid
    }
    vocabulary(lo)
  }

  private[index] def zipfPickBucketed(u: Double): String = zipfPick(u)

  private val epoch2026 = 1767225600000L // 2026-01-01T00:00:00Z

  /** Bit-exact replica of java.util.Random's LCG on a plain long. The
    * JDK generator guards its state with an AtomicLong, so every
    * `nextDouble` pays two CAS round-trips — and a page draws ~220
    * doubles, which made the thread-private generator the single largest
    * cost of page construction. Identical draw sequence (same scramble,
    * same 48-bit step, same nextInt rejection loop) is pinned by
    * WebtextGenSpec's golden-CRC corpus fingerprints. */
  private final class Lcg(seed: Long) {
    private[this] var state = (seed ^ 0x5DEECE66DL) & ((1L << 48) - 1)
    private def next(bits: Int): Int = {
      state = (state * 0x5DEECE66DL + 0xBL) & ((1L << 48) - 1)
      (state >>> (48 - bits)).toInt
    }
    def nextDouble(): Double =
      ((next(26).toLong << 27) + next(27)) * 1.1102230246251565e-16 // 0x1.0p-53
    def nextInt(bound: Int): Int = {
      if ((bound & -bound) == bound)
        return ((bound * next(31).toLong) >> 31).toInt
      var bits = next(31)
      var v = bits % bound
      while (bits - v + (bound - 1) < 0) { bits = next(31); v = bits % bound }
      v
    }
  }

  /** Pure page construction from (seed, i). Draw order (nBody, title×2,
    * body×nBody, lang) and every output byte are identical to the
    * original scala.util.Random + string-interpolation formulation —
    * WebtextGenSpec pins the corpus fingerprint. `text` for even ids is
    * assembled directly as "title title body": for THIS template that is
    * exactly `TextExtract.extractText(html)` (tags/style/script collapse
    * to single spaces, vocab words contain no tags or entities) — the
    * equality is spec-pinned, so the generator no longer re-parses the
    * html it just built. */
  def page(seed: Long, i: Long): Page = {
    val rnd = new Lcg(seed * 0x9E3779B97F4A7C15L + i)
    val nBody = 20 + rnd.nextInt(181)
    val t1 = zipfPick(rnd.nextDouble())
    val t2 = zipfPick(rnd.nextDouble())
    val sb = new java.lang.StringBuilder(96 + 8 * nBody)
    sb.append("<html><head><title>").append(t1).append(' ').append(t2)
      .append("</title><style>x{}</style></head><body><h1>")
      .append(t1).append(' ').append(t2).append("</h1><p>")
    val bodyStart = sb.length
    var k = 0
    while (k < nBody) {
      if (k > 0) sb.append(' ')
      sb.append(zipfPick(rnd.nextDouble()))
      k += 1
    }
    val bodyEnd = sb.length
    sb.append("</p><script>var a=1;</script></body></html>")
    val htmlBytes = sb.toString.getBytes(StandardCharsets.UTF_8)
    val lang = {
      val u = rnd.nextDouble()
      if (u < 0.80) "en" else if (u < 0.95) "ko" else "de"
    }
    val text =
      if (i % 2 == 0) {
        val tb = new java.lang.StringBuilder(10 + (bodyEnd - bodyStart) +
          2 * (t1.length + t2.length))
        tb.append(t1).append(' ').append(t2).append(' ')
          .append(t1).append(' ').append(t2).append(' ')
          .append(sb, bodyStart, bodyEnd)
        tb.toString
      } else null
    Page(
      url = s"https://site-${i % 97}.example/page/$i",
      warc_ts = new Timestamp(epoch2026 + i * 1000L),
      html = htmlBytes,
      text = text,
      lang = lang)
  }

  /** Distributed generation: `spark.range(n)` fans page construction out
    * across executors — the generator never materializes on the driver,
    * so the same code path scales to bench sizes.
    *
    * COLUMN-PRUNABLE: `url`/`warc_ts` are pure Catalyst expressions of
    * the row id (they never consumed the page's rnd stream, so values
    * are byte-identical to [[page]]), and only html/text/lang come from
    * the page-construction UDF. A narrow consumer — the id-assignment
    * boundary-sampling pass reads a url-ONLY projection — prunes the
    * expensive construction (html build + text extraction) entirely,
    * exactly as a parquet input would; the previous typed-map shape hid
    * every field from Catalyst and generated the full corpus twice per
    * build. Full-row reads evaluate the UDF once per row (deterministic
    * ⇒ subexpression elimination shares it across the field gets). */
  def df(spark: SparkSession, seed: Long, n: Long): DataFrame = {
    val rest = org.apache.spark.sql.functions.udf { (i: Long) =>
      val p = page(seed, i)
      (p.html, p.text, p.lang)
    }
    spark.range(n)
      .select(
        format_string("https://site-%d.example/page/%d",
          col("id") % 97, col("id")).as("url"),
        timestamp_millis(lit(epoch2026) + col("id") * 1000L).as("warc_ts"),
        rest(col("id")).as("r"))
      .select(col("url"), col("warc_ts"), col("r._1").as("html"),
        col("r._2").as("text"), col("r._3").as("lang"))
  }

  /** Driver-side generation for small unit-test corpora. */
  def pages(seed: Long, n: Int): Seq[Page] =
    (0L until n.toLong).map(page(seed, _))
}
