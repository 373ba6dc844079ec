package graftdrive

import graft.analysis.SynonymDict
import graft.query.Searcher
import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

/** Scratch: pinpoint which job/stage OOMs on the 20M index search.
  * DO NOT COMMIT. */
object Dress20Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .appName("dress20-probe")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    @volatile var curDesc = ""
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        curDesc = Option(j.properties.getProperty("spark.job.description"))
          .getOrElse("")
        println(s"PROBE job ${j.jobId} stages=${j.stageIds.mkString(",")} " +
          s"desc=${curDesc.take(90)}")
      }
      override def onStageSubmitted(s: SparkListenerStageSubmitted): Unit =
        println(s"PROBE  stage ${s.stageInfo.stageId} " +
          s"${s.stageInfo.name.take(80)} tasks=${s.stageInfo.numTasks}")
    })
    def step(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      try { f; println(f"PROBE STEP $name OK ${(System.nanoTime()-t0)/1e9}%.1f s") }
      catch { case e: Throwable =>
        println(s"PROBE STEP $name FAILED: ${e.getClass.getSimpleName} ${String.valueOf(e.getMessage).take(200)}")
        throw e
      }
    }
    var s: Searcher = null
    step("open") { s = new Searcher(spark, "/tmp/dress20/idx", SynonymDict.empty) }
    step("rare-search")(println("rows=" + s.searchWand("zanzibar quixotic", 10).collect().length))
    step("head-search")(println("rows=" + s.searchWand("spark index data", 10).collect().length))
    s.close(); spark.stop()
  }
}
