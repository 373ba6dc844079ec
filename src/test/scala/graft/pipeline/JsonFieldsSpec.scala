package graft.pipeline

import graft.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite

/** Dynamic JSON field expansion semantics (SURVEY.md A8/A9/A10, cites in
  * [[JsonFields]] scaladoc). */
class JsonFieldsSpec extends AnyFunSuite with SparkTestBase {

  import JsonFields._

  test("recursive descent: dotted upper-cased whitespace-stripped keys (A8)") {
    val fs = flattenJson("""{"a b": {"c d": 1.5, "E": "x"}}""")
    assert(fs == Seq(
      JField("AB.CD", "FLOAT", null, 1.5, null),
      JField("AB.E", "VARCHAR", "x", null, null)))
  }

  test("numbers type as FLOAT; booleans stringify; nulls drop") {
    val fs = flattenJson("""{"i": 3, "f": 2.25, "b": true, "n": null}""")
    assert(fs == Seq(
      JField("I", "FLOAT", null, 3.0, null),
      JField("F", "FLOAT", null, 2.25, null),
      JField("B", "VARCHAR", "true", null, null)))
  }

  test("date sniff yyyy-MM-dd HH:mm:ss → yyyyMMddHHmmss typed DATE (A7)") {
    val fs = flattenJson("""{"d": "2026-01-02 03:04:05", "s": "2026-13-40 99:99:99"}""")
    assert(fs == Seq(
      JField("D", "DATE", null, null, "20260102030405"),
      JField("S", "VARCHAR", "2026-13-40 99:99:99", null, null)))
  }

  test("arrays become multivalue under the same key, object arrays recurse (A9)") {
    val fs = flattenJson("""{"t": ["x", "y"], "o": [{"k": 1}, {"k": 2}]}""")
    assert(fs == Seq(
      JField("T", "VARCHAR", "x", null, null),
      JField("T", "VARCHAR", "y", null, null),
      JField("O.K", "FLOAT", null, 1.0, null),
      JField("O.K", "FLOAT", null, 2.0, null)))
  }

  test("date sniff rejects valid-prefix strings with trailing content") {
    val fs = flattenJson(
      """{"a": "2021-01-01 00:00:00 UTC", "b": "2021-01-01 00:00:00.123"}""")
    assert(fs == Seq(
      JField("A", "VARCHAR", "2021-01-01 00:00:00 UTC", null, null),
      JField("B", "VARCHAR", "2021-01-01 00:00:00.123", null, null)))
  }

  test("malformed / null / non-object json yields no rows") {
    assert(flattenJson("{oops").isEmpty)
    assert(flattenJson(null).isEmpty)
    assert(flattenJson("42").isEmpty)
  }

  test("DataFrame flatten: long-format side table") {
    val sp = spark
    import sp.implicits._
    val df = Seq((1L, """{"k": 7, "tag": "hot"}"""), (2L, null: String))
      .toDF("id", "props")
    val out = JsonFields.flatten(df, "id", "props")
      .orderBy("id", "key")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    assert(out.toSeq == Seq((1L, "K", "FLOAT"), (1L, "TAG", "VARCHAR")))
  }
}
