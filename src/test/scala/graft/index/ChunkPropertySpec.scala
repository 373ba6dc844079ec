package graft.index

import graft.codec.VarByte
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property test for the chunked k-way posting merge
  * ([[IndexBuilder.mergeArrays]] / [[IndexBuilder.encodeChunks]]) —
  * lives in graft.index for private[index] access. */
class ChunkPropertySpec extends AnyFunSuite {

  private def forAllSeeded[T](gen: Gen[T], n: Int = 100)(body: T => Unit): Unit = {
    val params = Gen.Parameters.default
    (1 to n).foreach { i =>
      gen(params, Seed(i.toLong)).foreach(body)
    }
  }

  private val postingListGen: Gen[(Array[Long], Array[Int], Array[Int])] =
    for {
      n <- Gen.chooseNum(0, 400)
      gaps <- Gen.listOfN(n, Gen.chooseNum(1L, 100000L))
      tfs <- Gen.listOfN(n, Gen.chooseNum(1, 1 << 20))
      dls <- Gen.listOfN(n, Gen.chooseNum(1, 1 << 16))
    } yield (gaps.scanLeft(0L)(_ + _).tail.toArray, tfs.toArray, dls.toArray)

  test("chunked merge: k-way merge + chunk-encode round-trips to the " +
    "sorted union; every chunk within cap (∀)") {
    import graft.index.IndexBuilder
    val multiGen = for {
      k <- Gen.chooseNum(1, 5)
      lists <- Gen.listOfN(k, postingListGen)
      cap <- Gen.chooseNum(1, 300)
      bs <- Gen.chooseNum(1, 64)
    } yield (lists, cap, bs)
    forAllSeeded(multiGen, n = 60) { case (lists, cap, bs) =>
      // disjoint doc ids across lists (the merge precondition): id*k+i
      // keeps each list strictly increasing, makes lists globally
      // disjoint (distinct residues mod k), and INTERLEAVES their ranges
      val decoded = lists.zipWithIndex.map { case ((ids, tfs, dls), i) =>
        (ids.map(id => id * lists.size + i), tfs, dls,
          null: Array[Array[Int]])
      }.toArray
      val chunks = IndexBuilder.encodeChunks(
        IndexBuilder.mergeArrays(decoded, withPos = false), bs, cap)
      val expected = decoded.flatMap(d =>
        d._1.indices.map(i => (d._1(i), d._2(i), d._3(i)))).sortBy(_._1).toSeq
      val got = chunks.flatMap { case (blob, cnt) =>
        val (d, t, l) = VarByte.decode(blob)
        assert(d.length == cnt && cnt <= cap || expected.isEmpty)
        d.indices.map(i => (d(i), t(i), l(i)))
      }.toSeq
      assert(got == expected)
    }
  }

}
