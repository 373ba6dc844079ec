package graft.analysis

import graft.functions.GraftRuntime
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** Pins the round-6 optimization identity: `GraftRuntime.docLen` (the
  * docstore pass's dl-only fast path) must equal the dl field of
  * `GraftRuntime.tfPairs` on every input, both analyzer modes, with and
  * without a synonym dictionary (multi-word rules included — expansion
  * changes the token count, so the dict path must go through the same
  * `expand`). */
class DocLenSpec extends AnyFunSuite {

  private def tfDl(dict: SynonymDict, s: String, mode: String): Int = {
    val arr = GraftRuntime.tfPairs(dict, UTF8String.fromString(s), mode)
    if (arr.numElements() == 0) 0
    else arr.getStruct(0, 3).getInt(2)
  }

  private def check(dict: SynonymDict, s: String, mode: String): Unit =
    assert(GraftRuntime.docLen(dict, UTF8String.fromString(s), mode) ==
      tfDl(dict, s, mode), s"input '$s' mode $mode")

  test("docLen == tfPairs.dl without a dictionary (text mode)") {
    Seq("", "   ", "a", "  a   b  ", "the Quick\tfox\n jumps",
      "나이키　신발", "a𝐞b c", "straße istanbul")
      .foreach(check(SynonymDict.empty, _, Tokenizer.Text))
  }

  test("docLen == tfPairs.dl without a dictionary (keyword mode)") {
    Seq("", "doc://src3/000042", "a-b_c.d", "???", "x1y2")
      .foreach(check(SynonymDict.empty, _, Tokenizer.Keyword))
  }

  test("docLen == tfPairs.dl with single- and multi-word synonym rules") {
    val dict = SynonymDict.parse(Seq(
      "spark => apachespark", "join,merge", "big data => bigdata"))
    Seq("", "spark join", "big data spark", "big data big data x",
      "merge big join data", "big big data")
      .foreach(check(dict, _, Tokenizer.Text))
  }

  test("docLen == tfPairs.dl on randomized corpora (both modes)") {
    val dict = SynonymDict.parse(Seq("w1,w2", "w3 w4 => w34"))
    val rnd = new scala.util.Random(42)
    val vocab = Array("w1", "w2", "w3", "w4", "w5", "a", "b-", "안녕", "ß", "9")
    (1 to 200).foreach { _ =>
      val s = Seq.fill(rnd.nextInt(30))(vocab(rnd.nextInt(vocab.length)))
        .mkString(if (rnd.nextBoolean()) " " else "  ")
      check(SynonymDict.empty, s, Tokenizer.Text)
      check(SynonymDict.empty, s, Tokenizer.Keyword)
      check(dict, s, Tokenizer.Text)
    }
  }
}
