package graft.index

import java.util.zip.CRC32

import org.scalatest.funsuite.AnyFunSuite

/** Pins the generator's output bytes across implementation changes: the
  * round-6 rewrite (plain-long LCG replica of java.util.Random, direct
  * text assembly instead of re-parsing the just-built html) must be a
  * pure speedup — the corpus is a cross-round fixture, so ANY byte drift
  * here silently changes every bench build and query result. The golden
  * CRCs were computed from the original scala.util.Random +
  * TextExtract.extractText formulation. */
class WebtextGenSpec extends AnyFunSuite {

  /** CRC over every field of pages 0 until n — the same fold that
    * produced the goldens. */
  private def corpusCrc(seed: Long, n: Long): Long = {
    val all = new CRC32
    var i = 0L
    while (i < n) {
      val p = WebtextGen.page(seed, i)
      all.update(p.html)
      all.update(p.lang.getBytes("UTF-8"))
      all.update(
        if (p.text == null) Array[Byte](0) else p.text.getBytes("UTF-8"))
      all.update(p.url.getBytes("UTF-8"))
      all.update(java.lang.Long.toString(p.warc_ts.getTime).getBytes("UTF-8"))
      i += 1
    }
    all.getValue
  }

  test("corpus fingerprint matches the pre-rewrite golden (5000 pages, " +
    "two seeds): LCG draw sequence and every output byte are unchanged") {
    assert(corpusCrc(42L, 5000L) == 540340448L)
    assert(corpusCrc(7L, 5000L) == 39001065L)
  }

  test("bucketed zipf pick is identical to the full-range binary search " +
    "over randomized and adversarial draws") {
    val rnd = new java.util.Random(1234L)
    var i = 0
    while (i < 1000000) {
      val u = rnd.nextDouble()
      assert(WebtextGen.zipfPickBucketed(u) == WebtextGen.zipfPickRef(u), s"u=$u")
      i += 1
    }
    // bucket-boundary adversaries: u at and 1-ulp around every k/4096
    var b = 0
    while (b < 4096) {
      val edge = b.toDouble / 4096
      for (u <- Seq(Math.nextDown(edge), edge, Math.nextUp(edge))
           if u >= 0.0 && u < 1.0)
        assert(WebtextGen.zipfPickBucketed(u) == WebtextGen.zipfPickRef(u), s"u=$u")
      b += 1
    }
    // the largest double below 1.0 (the u*4096 == 4096.0 rounding edge)
    val top = Math.nextDown(1.0)
    assert(WebtextGen.zipfPickBucketed(top) == WebtextGen.zipfPickRef(top))
  }

  test("even-id text is byte-equal to extract_text(html); odd ids stay " +
    "null (the generator's stated contract)") {
    var i = 0L
    while (i < 500L) {
      val p = WebtextGen.page(99L, i)
      if (i % 2 == 0)
        assert(p.text == graft.analysis.TextExtract.extractText(p.html),
          s"i=$i")
      else assert(p.text == null, s"i=$i")
      i += 1
    }
  }
}
