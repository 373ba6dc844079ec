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

  def tokenize(text: UTF8String): ArrayData = {
    val toks = Tokenizer.tokenize(text.toString)
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
  def tfPairs(dict: SynonymDict, text: UTF8String): ArrayData = {
    val toks = Tokenizer.tokenize(text.toString)
    val expanded: Seq[String] =
      if (dict.isEmpty) scala.collection.immutable.ArraySeq.unsafeWrapArray(toks)
      else dict.expand(scala.collection.immutable.ArraySeq.unsafeWrapArray(toks))
    val dl = expanded.length
    val m = new java.util.LinkedHashMap[String, Int]()
    expanded.foreach(t => m.put(t, m.getOrDefault(t, 0) + 1))
    val out = new Array[Any](m.size)
    val it = m.entrySet().iterator()
    var i = 0
    while (it.hasNext) {
      val e = it.next()
      out(i) = InternalRow(UTF8String.fromString(e.getKey), e.getValue, dl)
      i += 1
    }
    new GenericArrayData(out)
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
}
