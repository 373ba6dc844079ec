package graft.codec

import org.scalatest.funsuite.AnyFunSuite

class VarByteSpec extends AnyFunSuite {

  test("round-trip tiny") {
    val ids = Array(0L, 1L, 5L, 1000L, 1000000L)
    val tfs = Array(1, 2, 3, 127, 128)
    val blob = VarByte.encode(ids, tfs)
    val (d, t) = VarByte.decode(blob)
    assert(d.toSeq == ids.toSeq && t.toSeq == tfs.toSeq)
    assert(VarByte.count(blob) == 5)
    assert(VarByte.maxTf(blob) == 128)
  }

  test("empty list") {
    val blob = VarByte.encode(Array.empty[Long], Array.empty[Int])
    val (d, t) = VarByte.decode(blob)
    assert(d.isEmpty && t.isEmpty && VarByte.count(blob) == 0)
  }

  test("multi-block with block skipping by tf bound") {
    val n = 1000
    val ids = Array.tabulate(n)(i => i.toLong * 3 + 1)
    val tfs = Array.tabulate(n)(i => if (i / 128 == 3) 50 else 1) // block 3 is hot
    val blob = VarByte.encode(ids, tfs, blockSize = 128)
    val (d, t) = VarByte.decodeBlocksAboveTf(blob, minTf = 10)
    assert(d.length == 128 && t.forall(_ == 50))
    assert(d.head == ids(3 * 128) && d.last == ids(4 * 128 - 1))
    // minTf=1 decodes everything, in order
    val (dAll, _) = VarByte.decodeBlocksAboveTf(blob, minTf = 1)
    assert(dAll.toSeq == ids.toSeq)
  }

  test("unsorted input rejected") {
    intercept[IllegalArgumentException] {
      VarByte.encode(Array(5L, 3L), Array(1, 1))
    }
    intercept[IllegalArgumentException] {
      VarByte.encode(Array(5L, 5L), Array(1, 1)) // duplicates rejected too
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
      val bs = blockSizes(rnd.nextInt(blockSizes.length))
      val (d, t) = VarByte.decode(VarByte.encode(ids, tfs, bs))
      assert(d.toSeq == ids.toSeq && t.toSeq == tfs.toSeq, s"n=$n bs=$bs")
      // block-skip decode with minTf=0 must also be the identity
      val (d2, t2) = VarByte.decodeBlocksAboveTf(VarByte.encode(ids, tfs, bs), 0)
      assert(d2.toSeq == ids.toSeq && t2.toSeq == tfs.toSeq)
    }
  }
}
