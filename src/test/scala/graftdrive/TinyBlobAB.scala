package graftdrive

import graft.codec.VarByte

/** Scratch: v2 vs v3 encode+decode cost on TINY blobs (the tail-term
  * shape that dominates real builds). DO NOT COMMIT. */
object TinyBlobAB {
  def main(args: Array[String]): Unit = {
    val blobs = 2000000
    val post = 3
    def run(version: Int): (Double, Long) = {
      val t0 = System.nanoTime()
      var bytes = 0L
      var i = 0
      while (i < blobs) {
        val be = new VarByte.BlockEncoder(version = version)
        var k = 0
        while (k < post) { be.append(5L * (k + 1), 2, 100); k += 1 }
        bytes += be.finish().length
        i += 1
      }
      ((System.nanoTime() - t0) / 1e9, bytes)
    }
    run(2); run(3) // warmup
    for (r <- 1 to 3; v <- Seq(2, 3)) {
      val (sec, bytes) = run(v)
      println(f"TINY v$v: $sec%.2f s  ${blobs / sec / 1e6}%.2f M blobs/s  " +
        f"${bytes.toDouble / blobs}%.1f B/blob")
    }
    // decode cost on the tiny shape
    val b2 = { val e = new VarByte.BlockEncoder(version = 2)
      (1 to post).foreach(k => e.append(5L * k, 2, 100)); e.finish() }
    val b3 = { val e = new VarByte.BlockEncoder(version = 3)
      (1 to post).foreach(k => e.append(5L * k, 2, 100)); e.finish() }
    def scan(blob: Array[Byte]): Double = {
      val t0 = System.nanoTime()
      var i = 0
      var acc = 0L
      while (i < blobs) {
        VarByte.scan(blob)(_ => true)((d, tf, dl) => acc += d + tf + dl)
        i += 1
      }
      val dt = (System.nanoTime() - t0) / 1e9
      if (acc == 42) println("x")
      dt
    }
    scan(b2); scan(b3)
    for (r <- 1 to 2) {
      println(f"TINY scan v2: ${scan(b2)}%.2f s   v3: ${scan(b3)}%.2f s")
    }
  }
}

object BigBlobAB {
  def main(args: Array[String]): Unit = {
    val n = 20000000
    val rnd = new java.util.Random(7)
    val ids = new Array[Long](n); val tfs = new Array[Int](n)
    val dls = new Array[Int](n)
    var id = 0L; var i = 0
    while (i < n) {
      id += 1 + rnd.nextInt(60); ids(i) = id
      tfs(i) = 1 + (math.abs(rnd.nextGaussian()) * 2).toInt
      dls(i) = 40 + rnd.nextInt(400); i += 1
    }
    def run(version: Int): (Double, Long) = {
      val t0 = System.nanoTime(); var bytes = 0L; var off = 0
      while (off < n) {
        val len = math.min(500000, n - off)
        val be = new graft.codec.VarByte.BlockEncoder(version = version)
        val base = ids(off) - 1
        var k = off
        while (k < off + len) { be.append(ids(k) - base, tfs(k), dls(k)); k += 1 }
        bytes += be.finish().length; off += len
      }
      ((System.nanoTime() - t0) / 1e9, bytes)
    }
    run(2); run(3)
    for (v <- Seq(2, 3); _ <- 1 to 2) {
      val (sec, bytes) = run(v)
      println(f"BIG v$v: $sec%.3f s  ${n / sec / 1e6}%.1f M postings/s  ${bytes / 1e6}%.1f MB")
    }
  }
}
