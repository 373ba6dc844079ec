package graft.codec

import scala.collection.mutable.ArrayBuffer

/** Delta + variable-byte posting-list compression with block headers
  * (SURVEY.md §2.11, north-rule "delta-encoded + variable-byte-compressed
  * posting lists").
  *
  * A posting list is a docId-ascending sequence of (docId, tf). Layout:
  * {{{
  *   [count varint][blockSize varint]
  *   per block:
  *     [n varint]            entries in this block (<= blockSize)
  *     [bodyLen varint]      body byte length — enables block SKIP
  *     [maxTf varint]        max tf in block — block-max WAND upper bound
  *     [lastDelta varint]    blockLastDocId - prevBlockLastDocId — lets a
  *                           skipper re-base without decoding the body
  *     body: [docGap varint][tf varint] * n   (gaps vs previous docId)
  * }}}
  * All ints unsigned LEB128 (7 bits/byte, high bit = continuation).
  * The block headers make both conjunctive docId skipping and block-max
  * WAND pruning possible without decompressing skipped blocks.
  */
object VarByte {

  val DefaultBlockSize = 128

  @inline private def writeVLong(buf: ArrayBuffer[Byte], v0: Long): Unit = {
    var v = v0
    require(v >= 0, s"varint must be non-negative, got $v")
    while ((v & ~0x7FL) != 0L) {
      buf += ((v & 0x7F) | 0x80).toByte
      v >>>= 7
    }
    buf += v.toByte
  }

  final class Reader(val bytes: Array[Byte], var pos: Int) {
    @inline def readVLong(): Long = {
      var b = bytes(pos); pos += 1
      var v = (b & 0x7F).toLong
      var shift = 7
      while ((b & 0x80) != 0) {
        b = bytes(pos); pos += 1
        v |= (b & 0x7F).toLong << shift
        shift += 7
      }
      v
    }
    @inline def readVInt(): Int = readVLong().toInt
  }

  /** Encode a docId-ascending (docId, tf) list. Throws on unsorted or
    * duplicate docIds — the build pipeline guarantees sorted input via
    * sortWithinPartitions (SURVEY.md §3.1). */
  def encode(docIds: Array[Long], tfs: Array[Int],
             blockSize: Int = DefaultBlockSize): Array[Byte] = {
    require(docIds.length == tfs.length)
    val n = docIds.length
    val out = new ArrayBuffer[Byte](n * 2 + 16)
    writeVLong(out, n.toLong)
    writeVLong(out, blockSize.toLong)
    var i = 0
    var prevBlockLast = 0L
    val body = new ArrayBuffer[Byte](blockSize * 3)
    while (i < n) {
      val bn = math.min(blockSize, n - i)
      body.clear()
      var prev = prevBlockLast
      var maxTf = 0
      var first = true
      var k = 0
      while (k < bn) {
        val d = docIds(i + k)
        val gap = d - prev
        require(gap > 0 || (first && gap == 0 && prevBlockLast == 0 && d == 0),
          s"docIds must be strictly ascending: $d after $prev")
        writeVLong(body, gap)
        writeVLong(body, tfs(i + k).toLong)
        if (tfs(i + k) > maxTf) maxTf = tfs(i + k)
        prev = d
        first = false
        k += 1
      }
      writeVLong(out, bn.toLong)
      writeVLong(out, body.length.toLong)
      writeVLong(out, maxTf.toLong)
      writeVLong(out, prev - prevBlockLast)
      out ++= body
      prevBlockLast = prev
      i += bn
    }
    out.toArray
  }

  /** Full decode → (docIds, tfs). */
  def decode(blob: Array[Byte]): (Array[Long], Array[Int]) = {
    val r = new Reader(blob, 0)
    val n = r.readVInt()
    r.readVInt() // blockSize
    val docIds = new Array[Long](n)
    val tfs = new Array[Int](n)
    var filled = 0
    var prevBlockLast = 0L
    while (filled < n) {
      val bn = r.readVInt()
      r.readVInt() // bodyLen
      r.readVInt() // maxTf
      r.readVLong() // lastDelta
      var prev = prevBlockLast
      var k = 0
      while (k < bn) {
        prev += r.readVLong()
        docIds(filled) = prev
        tfs(filled) = r.readVInt()
        filled += 1
        k += 1
      }
      prevBlockLast = prev
    }
    (docIds, tfs)
  }

  /** Number of postings without decoding the body. */
  def count(blob: Array[Byte]): Int = new Reader(blob, 0).readVInt()

  /** Max tf across all blocks (term-level WAND upper bound) read from the
    * block headers only. */
  def maxTf(blob: Array[Byte]): Int = {
    val r = new Reader(blob, 0)
    val n = r.readVInt()
    r.readVInt()
    var filled = 0
    var best = 0
    while (filled < n) {
      val bn = r.readVInt()
      val bodyLen = r.readVInt()
      val m = r.readVInt()
      r.readVLong()
      if (m > best) best = m
      r.pos += bodyLen
      filled += bn
    }
    best
  }

  /** Decode only blocks whose block-max tf satisfies `minTf` — the
    * building block for block-max WAND pruning: the caller converts its
    * score threshold into a minimum tf bound for this term. Skipped blocks
    * cost only a header read. */
  def decodeBlocksAboveTf(blob: Array[Byte], minTf: Int): (Array[Long], Array[Int]) = {
    val r = new Reader(blob, 0)
    val n = r.readVInt()
    r.readVInt()
    val docIds = new ArrayBuffer[Long](n)
    val tfs = new ArrayBuffer[Int](n)
    var filled = 0
    var prevBlockLast = 0L
    while (filled < n) {
      val bn = r.readVInt()
      val bodyLen = r.readVInt()
      val blockMax = r.readVInt()
      val lastDelta = r.readVLong()
      if (blockMax < minTf) {
        r.pos += bodyLen // skip the whole block
      } else {
        var prev = prevBlockLast
        var k = 0
        while (k < bn) {
          prev += r.readVLong()
          docIds += prev
          tfs += r.readVInt()
          k += 1
        }
      }
      prevBlockLast += lastDelta
      filled += bn
    }
    (docIds.toArray, tfs.toArray)
  }
}
