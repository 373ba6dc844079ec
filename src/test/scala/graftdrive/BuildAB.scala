package graftdrive

import org.apache.spark.sql.SparkSession
import graft.index.{IndexBuilder, WebtextGen}
import graft.analysis.SynonymDict

/** Scratch interleaved v2/v3 build A/B with the deboxed encoder.
  * DO NOT COMMIT. */
object BuildAB {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .appName("build-ab")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val n = 800000L
    def tmp() = java.nio.file.Files.createTempDirectory("graft-ab-").toString
    def cfg(v: Int) = IndexBuilder.IndexConfig(numParts = 64, rangeParts = 32,
      saltDf = 1000, saltFanout = 8, formatVersion = v)
    def run(v: Int): Double = {
      val t0 = System.nanoTime()
      IndexBuilder.buildFull(spark, WebtextGen.df(spark, 42L, n),
        SynonymDict.empty, tmp(), cfg(v), "ab")
      (System.nanoTime() - t0) / 1e9
    }
    run(2) // warmup
    for (round <- 1 to 3; v <- Seq(2, 3)) {
      val load = scala.io.Source.fromFile("/proc/loadavg").mkString.split(" ")(0)
      val sec = run(v)
      println(f"AB round=$round v$v: $sec%.1f s  ${n / sec}%.0f docs/s  load=$load")
    }
    spark.stop()
  }
}
