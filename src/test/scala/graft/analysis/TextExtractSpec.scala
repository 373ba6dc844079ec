package graft.analysis

import org.scalatest.funsuite.AnyFunSuite
import java.nio.charset.StandardCharsets

class TextExtractSpec extends AnyFunSuite {
  private def ex(s: String): String =
    TextExtract.extractText(s.getBytes(StandardCharsets.UTF_8))

  test("self-closing <script/>/<style/> opens no block (XHTML crawl data)") {
    assert(ex("<html><head><script src=\"a.js\"/></head>" +
      "<body>all the real content</body></html>") == "all the real content")
    assert(ex("a <style/> b <script type=\"x\"/> c") == "a b c")
    // unterminated OPEN block still runs to EOF (truncated page)
    assert(ex("keep <script>var x = dropped") == "keep")
  }

  test("golden: full page shape from FIXTURES.md §1") {
    val html = "<html><head><title>hello world</title><style>x{}</style></head>" +
      "<body><h1>hello world</h1><p>the quick fox</p><script>var a=1;</script></body></html>"
    assert(ex(html) == "hello world hello world the quick fox")
  }

  test("script/style blocks dropped, case-insensitive, with attributes") {
    assert(ex("a<SCRIPT type=\"x\">alert('<b>hi</b>')</SCRIPT>b") == "a b")
    assert(ex("a<style media='x'>p { color: red }</Style>b") == "a b")
  }

  test("unterminated script runs to EOF") {
    assert(ex("keep<script>var x = 1; nothing after") == "keep")
  }

  test("tags replaced by a single space; comments too") {
    assert(ex("a<br/>b<!-- note -->c") == "a b c")
    assert(ex("<p>a</p><p>b</p>") == "a b")
  }

  test("entities: named core set, numeric dec/hex, unknown left verbatim") {
    assert(ex("x &amp; y &lt;z&gt; &quot;q&quot; &apos;a&apos;") == "x & y <z> \"q\" 'a'")
    assert(ex("a&nbsp;b") == "a b")
    assert(ex("&#65;&#x42;&#x63;") == "ABc")
    assert(ex("&bogus; &amp") == "&bogus; &amp")
  }

  test("whitespace collapsed, trimmed") {
    assert(ex("  a \t\r\n  b  ") == "a b")
  }

  test("utf-8 multibyte preserved; malformed bytes → U+FFFD") {
    assert(ex("<p>나이키 신발</p>") == "나이키 신발")
    val bad = Array[Byte]('a'.toByte, 0xC3.toByte, 'b'.toByte)
    assert(TextExtract.extractText(bad) == "a�b")
  }

  test("null → null; empty → empty") {
    assert(TextExtract.extractText(null) == null)
    assert(ex("") == "")
  }

  test("determinism: same bytes → same string (byte-identical contract)") {
    val html = "<body>mixed &#x20AC; price &amp; more</body>".getBytes(StandardCharsets.UTF_8)
    val a = TextExtract.extractText(html)
    val b = TextExtract.extractText(html.clone())
    assert(a == b && a == "mixed € price & more")
  }
}
