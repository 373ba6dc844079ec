package graft.codec

import scala.collection.mutable.ArrayBuffer

/** Delta + variable-byte posting-list compression with block headers
  * (SURVEY.md §2.11, north-rule "delta-encoded + variable-byte-compressed
  * posting lists").
  *
  * A posting list is a docId-ascending sequence of (docId, tf, dl) where
  * `dl` is the document's BM25 field length. Colocating dl with the
  * posting (the analog of Lucene's per-document norms, which live next to
  * the inverted lists in a segment) makes BM25 scoring partition-local:
  * the query path never joins a 10^12-row docstore just to fetch lengths.
  * Cost: ~1-2 varint bytes per posting; decision recorded in SURVEY.md §7.
  *
  * Layout:
  * {{{
  *   [count varint][blockSize varint]
  *   per block:
  *     [n varint]            entries in this block (<= blockSize)
  *     [bodyLen varint]      body byte length — enables block SKIP
  *     [maxTf varint]        max tf in block   — block-max WAND bound
  *     [minDl varint]        min dl in block   — block-max WAND bound
  *                           (BM25 contribution is monotone increasing in
  *                           tf and decreasing in dl, so f(maxTf, minDl)
  *                           upper-bounds every entry in the block)
  *     [lastDelta varint]    blockLastDocId - prevBlockLastDocId — lets a
  *                           skipper re-base without decoding the body
  *     body: [docGap varint][tf varint][dl varint] * n
  * }}}
  * All ints unsigned LEB128 (7 bits/byte, high bit = continuation).
  * The block headers make docId skipping (conjunctive probes) and
  * block-max WAND pruning possible without decompressing skipped blocks.
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

  /** One decoded block header; `firstPossibleDocId` = prevBlockLast + 1
    * and `lastDocId` bound the block's docId range without body decode. */
  final case class BlockHeader(n: Int, bodyLen: Int, maxTf: Int, minDl: Int,
                               prevBlockLast: Long, lastDocId: Long,
                               bodyPos: Int)

  /** Encode a docId-ascending (docId, tf, dl) list. Throws on unsorted or
    * duplicate docIds — the build pipeline guarantees sorted input via
    * sortWithinPartitions (SURVEY.md §3.1). */
  def encode(docIds: Array[Long], tfs: Array[Int], dls: Array[Int],
             blockSize: Int = DefaultBlockSize): Array[Byte] = {
    require(docIds.length == tfs.length && docIds.length == dls.length)
    val n = docIds.length
    val out = new ArrayBuffer[Byte](n * 3 + 16)
    writeVLong(out, n.toLong)
    writeVLong(out, blockSize.toLong)
    var i = 0
    var prevBlockLast = 0L
    val body = new ArrayBuffer[Byte](blockSize * 4)
    while (i < n) {
      val bn = math.min(blockSize, n - i)
      body.clear()
      var prev = prevBlockLast
      var maxTf = 0
      var minDl = Int.MaxValue
      var first = true
      var k = 0
      while (k < bn) {
        val d = docIds(i + k)
        val gap = d - prev
        require(gap > 0 || (first && gap == 0 && prevBlockLast == 0 && d == 0),
          s"docIds must be strictly ascending: $d after $prev")
        writeVLong(body, gap)
        writeVLong(body, tfs(i + k).toLong)
        writeVLong(body, dls(i + k).toLong)
        if (tfs(i + k) > maxTf) maxTf = tfs(i + k)
        if (dls(i + k) < minDl) minDl = dls(i + k)
        prev = d
        first = false
        k += 1
      }
      writeVLong(out, bn.toLong)
      writeVLong(out, body.length.toLong)
      writeVLong(out, maxTf.toLong)
      writeVLong(out, (if (minDl == Int.MaxValue) 0 else minDl).toLong)
      writeVLong(out, prev - prevBlockLast)
      out ++= body
      prevBlockLast = prev
      i += bn
    }
    out.toArray
  }

  /** Iterate block headers, calling `onBlock`; return value decides
    * whether the body is decoded (true) or skipped via bodyLen (false).
    * When decoded, `onEntry(docId, tf, dl)` fires per posting. The
    * workhorse behind full decode, WAND pruning and docId skipping. */
  @inline def scan(blob: Array[Byte])(
      onBlock: BlockHeader => Boolean)(
      onEntry: (Long, Int, Int) => Unit): Unit = {
    val r = new Reader(blob, 0)
    val n = r.readVInt()
    r.readVInt() // blockSize
    var filled = 0
    var prevBlockLast = 0L
    while (filled < n) {
      val bn = r.readVInt()
      val bodyLen = r.readVInt()
      val maxTf = r.readVInt()
      val minDl = r.readVInt()
      val lastDelta = r.readVLong()
      val h = BlockHeader(bn, bodyLen, maxTf, minDl, prevBlockLast,
        prevBlockLast + lastDelta, r.pos)
      if (onBlock(h)) {
        var prev = prevBlockLast
        var k = 0
        while (k < bn) {
          prev += r.readVLong()
          val tf = r.readVInt()
          val dl = r.readVInt()
          onEntry(prev, tf, dl)
          k += 1
        }
      } else {
        r.pos += bodyLen
      }
      prevBlockLast = h.lastDocId
      filled += bn
    }
  }

  /** Full decode → (docIds, tfs, dls). */
  def decode(blob: Array[Byte]): (Array[Long], Array[Int], Array[Int]) = {
    val n = count(blob)
    val docIds = new Array[Long](n)
    val tfs = new Array[Int](n)
    val dls = new Array[Int](n)
    var i = 0
    scan(blob)(_ => true) { (d, tf, dl) =>
      docIds(i) = d; tfs(i) = tf; dls(i) = dl; i += 1
    }
    (docIds, tfs, dls)
  }

  /** Number of postings without decoding the body. */
  def count(blob: Array[Byte]): Int = new Reader(blob, 0).readVInt()

  /** (max tf, min dl) across blocks from headers only — the term-level
    * WAND upper bound inputs. */
  def termBounds(blob: Array[Byte]): (Int, Int) = {
    var maxTf = 0
    var minDl = Int.MaxValue
    scan(blob) { h =>
      if (h.maxTf > maxTf) maxTf = h.maxTf
      if (h.n > 0 && h.minDl < minDl) minDl = h.minDl
      false
    }((_, _, _) => ())
    (maxTf, if (minDl == Int.MaxValue) 0 else minDl)
  }

  /** Decode only entries whose docId is in `sorted` (ascending array):
    * blocks whose [first, last] docId range contains no candidate are
    * skipped at header cost — the conjunctive-probe / rescore primitive. */
  def decodeForDocs(blob: Array[Byte], sorted: Array[Long])
      : (Array[Long], Array[Int], Array[Int]) = {
    val docIds = new ArrayBuffer[Long]()
    val tfs = new ArrayBuffer[Int]()
    val dls = new ArrayBuffer[Int]()
    if (sorted.isEmpty) return (Array.empty, Array.empty, Array.empty)
    scan(blob) { h =>
      // any candidate in (prevBlockLast, lastDocId]? (first block may
      // start at docId 0 == prevBlockLast)
      var lo = java.util.Arrays.binarySearch(sorted, h.prevBlockLast)
      if (lo < 0) lo = -lo - 1
      lo < sorted.length && sorted(lo) <= h.lastDocId
    } { (d, tf, dl) =>
      if (java.util.Arrays.binarySearch(sorted, d) >= 0) {
        docIds += d; tfs += tf; dls += dl
      }
    }
    (docIds.toArray, tfs.toArray, dls.toArray)
  }
}
