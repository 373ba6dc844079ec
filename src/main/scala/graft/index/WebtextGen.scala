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

  private def zipfPick(u: Double): String = {
    var lo = 0
    var hi = VocabSize - 1
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (zipfCum(mid) < u) lo = mid + 1 else hi = mid
    }
    vocabulary(lo)
  }

  private val epoch2026 = 1767225600000L // 2026-01-01T00:00:00Z

  /** Pure page construction from (seed, i). */
  def page(seed: Long, i: Long): Page = {
    val rnd = new scala.util.Random(seed * 0x9E3779B97F4A7C15L + i)
    val nBody = 20 + rnd.nextInt(181)
    val title = s"${zipfPick(rnd.nextDouble())} ${zipfPick(rnd.nextDouble())}"
    val body = new StringBuilder
    var k = 0
    while (k < nBody) {
      if (k > 0) body.append(' ')
      body.append(zipfPick(rnd.nextDouble()))
      k += 1
    }
    val html =
      s"<html><head><title>$title</title><style>x{}</style></head><body>" +
        s"<h1>$title</h1><p>$body</p><script>var a=1;</script></body></html>"
    val htmlBytes = html.getBytes(StandardCharsets.UTF_8)
    val lang = {
      val u = rnd.nextDouble()
      if (u < 0.80) "en" else if (u < 0.95) "ko" else "de"
    }
    val text =
      if (i % 2 == 0) graft.analysis.TextExtract.extractText(htmlBytes)
      else null
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
