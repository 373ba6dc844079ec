package graft.codec

import org.scalatest.funsuite.AnyFunSuite

class VarByteSpec extends AnyFunSuite {

  test("round-trip tiny") {
    val ids = Array(0L, 1L, 5L, 1000L, 1000000L)
    val tfs = Array(1, 2, 3, 127, 128)
    val dls = Array(10, 20, 30, 40, 50)
    val blob = VarByte.encode(ids, tfs, dls)
    val (d, t, l) = VarByte.decode(blob)
    assert(d.toSeq == ids.toSeq && t.toSeq == tfs.toSeq && l.toSeq == dls.toSeq)
    assert(VarByte.count(blob) == 5)
    assert(VarByte.termBounds(blob) == ((128, 10)))
  }

  test("empty list") {
    val blob = VarByte.encode(Array.empty[Long], Array.empty[Int], Array.empty[Int])
    val (d, t, l) = VarByte.decode(blob)
    assert(d.isEmpty && t.isEmpty && l.isEmpty && VarByte.count(blob) == 0)
  }

  test("block headers carry per-block (maxTf, minDl) and skipping works") {
    val n = 1000
    val ids = Array.tabulate(n)(i => i.toLong * 3 + 1)
    val tfs = Array.tabulate(n)(i => if (i / 128 == 3) 50 else 1) // block 3 hot
    val dls = Array.fill(n)(100)
    val blob = VarByte.encode(ids, tfs, dls, blockSize = 128)
    // scan with a tf-bound predicate: only block 3 should decode
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Int)]
    VarByte.scan(blob)(h => h.maxTf >= 10)((d, tf, _) => out += ((d, tf)))
    assert(out.length == 128 && out.forall(_._2 == 50))
    assert(out.head._1 == ids(3 * 128) && out.last._1 == ids(4 * 128 - 1))
    // header-only term bounds
    assert(VarByte.termBounds(blob) == ((50, 100)))
  }

  test("decodeForDocs skips blocks without candidates and filters exactly") {
    val n = 1000
    val ids = Array.tabulate(n)(i => i.toLong * 2)
    val tfs = Array.tabulate(n)(i => 1 + i % 7)
    val dls = Array.tabulate(n)(i => 10 + i % 13)
    val blob = VarByte.encode(ids, tfs, dls, blockSize = 64)
    val want = Array(0L, 2L, 998L, 1000L, 1999L /* absent (odd) */, 1998L)
    java.util.Arrays.sort(want)
    val (d, t, l) = VarByte.decodeForDocs(blob, want)
    val expectedIdx = Seq(0, 1, 499, 500, 999)
    assert(d.toSeq == expectedIdx.map(ids(_)))
    assert(t.toSeq == expectedIdx.map(tfs(_)))
    assert(l.toSeq == expectedIdx.map(dls(_)))
    // no candidates → nothing decoded
    assert(VarByte.decodeForDocs(blob, Array.empty[Long])._1.isEmpty)
    // candidates all out of range
    assert(VarByte.decodeForDocs(blob, Array(5000L, 6000L))._1.isEmpty)
  }

  test("unsorted input rejected") {
    intercept[IllegalArgumentException] {
      VarByte.encode(Array(5L, 3L), Array(1, 1), Array(1, 1))
    }
    intercept[IllegalArgumentException] {
      VarByte.encode(Array(5L, 5L), Array(1, 1), Array(1, 1)) // duplicates too
    }
  }

  test("positions round-trip; position-free scan skips position bytes; " +
    "hasPositions flag") {
    val ids = Array(0L, 7L, 9L, 500L)
    val tfs = Array(2, 1, 3, 1)
    val dls = Array(9, 9, 12, 4)
    val pos = Array(Array(0, 5), Array(3), Array(1, 2, 11), Array(0))
    val blob = VarByte.encode(ids, tfs, dls, blockSize = 2, positions = pos)
    assert(VarByte.hasPositions(blob))
    val (d, t, l, p) = VarByte.decodeWithPositions(blob)
    assert(d.toSeq == ids.toSeq && t.toSeq == tfs.toSeq && l.toSeq == dls.toSeq)
    assert(p.map(_.toSeq).toSeq == pos.map(_.toSeq).toSeq)
    // the position-free paths must read the same (docId, tf, dl) stream
    val (d2, t2, l2) = VarByte.decode(blob)
    assert(d2.toSeq == ids.toSeq && t2.toSeq == tfs.toSeq && l2.toSeq == dls.toSeq)
    assert(VarByte.count(blob) == 4)
    assert(VarByte.termBounds(blob) == ((3, 4)))
    val noPos = VarByte.encode(ids, tfs, dls, blockSize = 2)
    assert(!VarByte.hasPositions(noPos))
    // positions length must equal tf
    intercept[IllegalArgumentException] {
      VarByte.encode(Array(1L), Array(2), Array(5),
        positions = Array(Array(0)))
    }
  }

  test("magic/version guard: foreign or pre-v2 bytes fail loudly") {
    intercept[IllegalArgumentException] {
      VarByte.decode(Array[Byte](5, 1, 0, 0)) // old layout: count varint first
    }
    intercept[IllegalArgumentException] {
      VarByte.count(Array[Byte](VarByte.Magic, 9)) // wrong version
    }
  }

  test("property: positional encode ∘ decodeWithPositions = id (seeded)") {
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 60) {
      val n = rnd.nextInt(300)
      val gaps = Array.fill(n)(1L + rnd.nextLong(5000L))
      val ids = gaps.scanLeft(0L)(_ + _).tail
      val tfs = Array.fill(n)(1 + rnd.nextInt(8))
      val dls = Array.fill(n)(1 + rnd.nextInt(1000))
      val pos = tfs.map { tf =>
        val pGaps = Array.fill(tf)(1 + rnd.nextInt(10))
        pGaps.scanLeft(rnd.nextInt(5))(_ + _).tail
      }
      val bs = 1 + rnd.nextInt(200)
      val blob = VarByte.encode(ids, tfs, dls, bs, pos)
      val (d, t, l, p) = VarByte.decodeWithPositions(blob)
      assert(d.toSeq == ids.toSeq && t.toSeq == tfs.toSeq && l.toSeq == dls.toSeq)
      assert(p.map(_.toSeq).toSeq == pos.map(_.toSeq).toSeq, s"n=$n bs=$bs")
      // scan/decodeForDocs must skip position bytes correctly
      val subset = ids.filter(_ => rnd.nextBoolean())
      val (d2, t2, _) = VarByte.decodeForDocs(blob, subset)
      val idx = ids.zipWithIndex.filter(q => subset.contains(q._1)).map(_._2)
      assert(d2.toSeq == idx.map(ids(_)).toSeq && t2.toSeq == idx.map(tfs(_)).toSeq)
    }
  }

  test("property: encode ∘ decode = id for random sorted posting lists (seeded)") {
    val rnd = new scala.util.Random(42)
    val blockSizes = Array(1, 7, 128, 1024)
    for (_ <- 1 to 200) {
      val n = rnd.nextInt(500)
      val gaps = Array.fill(n)(1L + rnd.nextLong(100000L))
      val ids = gaps.scanLeft(0L)(_ + _).tail
      val tfs = Array.fill(n)(1 + rnd.nextInt(1 << 20))
      val dls = Array.fill(n)(1 + rnd.nextInt(1 << 16))
      val bs = blockSizes(rnd.nextInt(blockSizes.length))
      val blob = VarByte.encode(ids, tfs, dls, bs)
      val (d, t, l) = VarByte.decode(blob)
      assert(d.toSeq == ids.toSeq && t.toSeq == tfs.toSeq && l.toSeq == dls.toSeq,
        s"n=$n bs=$bs")
      // decodeForDocs on a random subset = exact subset, in order
      val subset = ids.filter(_ => rnd.nextBoolean())
      val (d2, t2, l2) = VarByte.decodeForDocs(blob, subset)
      val idx = ids.zipWithIndex.filter(p => subset.contains(p._1)).map(_._2)
      assert(d2.toSeq == idx.map(ids(_)).toSeq)
      assert(t2.toSeq == idx.map(tfs(_)).toSeq)
      assert(l2.toSeq == idx.map(dls(_)).toSeq)
    }
  }
}
