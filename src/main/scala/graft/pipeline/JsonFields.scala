package graft.pipeline

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dynamic JSON field expansion (SURVEY.md §2.2 A8/A9/A10) — the
  * reference's schema escape hatch, semantics mirrored from
  * `/root/reference/LuceneSearchEngine/src/Indexer.java`:
  *  - recursive object descent; child key = `PARENT.CHILD`, upper-cased
  *    and whitespace-stripped (:594);
  *  - JSON numbers → FLOAT (:608-611 shape: numeric dynamic fields are
  *    float-typed; `src/Searcher.java:479-491` re-infers FLOAT from
  *    4-byte points);
  *  - strings sniffed as `yyyy-MM-dd HH:mm:ss` → reformatted to
  *    `yyyyMMddHHmmss`, typed DATE (:612-627); other strings → VARCHAR;
  *  - arrays → multivalue: each element emitted under the same key
  *    (:749-889), nested object arrays recurse;
  *  - null / malformed JSON yields no rows (reference swallows parse
  *    failures per-field).
  *
  * Output is a LONG-format side table `(id, key, vtype, str_val,
  * num_val, date_val)` — at 10^12 scale a long table beats per-key
  * columns (no schema explosion, columnar-compresses well, key-predicate
  * pushdown works).
  */
object JsonFields {

  final case class JField(key: String, vtype: String, str_val: String,
                          num_val: java.lang.Double, date_val: String)

  private val dateIn = "yyyy-MM-dd HH:mm:ss"
  private val dateOut = "yyyyMMddHHmmss"

  // ObjectMapper construction is the most expensive part of small-doc
  // parsing; readTree is thread-safe, so one shared instance serves every
  // row of every task in the executor JVM
  private lazy val mapper = new ObjectMapper()

  /** Pure per-value flatten, reference recursion shape. */
  def flattenJson(json: String): Seq[JField] = {
    if (json == null) return Seq.empty
    val root =
      try mapper.readTree(json)
      catch { case _: Exception => return Seq.empty }
    val out = Seq.newBuilder[JField]
    def normKey(parent: String, child: String): String = {
      val c = child.toUpperCase.replaceAll("\\s+", "")
      if (parent.isEmpty) c else s"$parent.$c"
    }
    def visit(key: String, node: JsonNode): Unit = node match {
      case n if n.isObject =>
        n.fields().forEachRemaining(e => visit(normKey(key, e.getKey), e.getValue))
      case n if n.isArray => n.forEach(e => visit(key, e)) // multivalue (A9)
      case n if n.isNumber =>
        out += JField(key, "FLOAT", null, n.asDouble(), null)
      case n if n.isTextual =>
        val s = n.asText()
        sniffDate(s) match {
          case Some(d) => out += JField(key, "DATE", null, null, d)
          case None => out += JField(key, "VARCHAR", s, null, null)
        }
      case n if n.isBoolean =>
        out += JField(key, "VARCHAR", n.asText(), null, null)
      case _ => () // null → no row
    }
    if (root != null && root.isObject) visit("", root)
    out.result()
  }

  private val dateShape =
    java.util.regex.Pattern.compile("""\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2}""")

  /** `yyyy-MM-dd HH:mm:ss` → `yyyyMMddHHmmss` (strict, ENTIRE string;
    * Indexer.java:612-627). A bare SimpleDateFormat.parse accepts any
    * valid-prefix string and would misclassify e.g.
    * "2021-01-01 00:00:00 UTC" as a DATE. */
  def sniffDate(s: String): Option[String] = {
    if (!dateShape.matcher(s).matches()) return None
    val fmt = new java.text.SimpleDateFormat(dateIn)
    fmt.setLenient(false)
    try { fmt.parse(s); Some(s.replaceAll("[-: ]", "")) }
    catch { case _: java.text.ParseException => None }
  }

  /** Long-format dynamic-field table over a JSON string column. */
  def flatten(df: DataFrame, idCol: String, jsonCol: String): DataFrame = {
    val fUdf = udf((s: String) => flattenJson(s))
    df.select(col(idCol), explode(fUdf(col(jsonCol))).as("f"))
      .select(col(idCol), col("f.key").as("key"), col("f.vtype").as("vtype"),
        col("f.str_val").as("str_val"), col("f.num_val").as("num_val"),
        col("f.date_val").as("date_val"))
  }
}
