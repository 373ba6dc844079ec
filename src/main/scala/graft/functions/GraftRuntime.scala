package graft.functions

import graft.analysis.{TextExtract, Tokenizer}
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
