package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

/** g23 spill diagnosis (VERDICT r13 item 4): runs g23_link_predict in a
  * FRESH session (the sweep context that shows the 136 s sf1 cost) with
  * a stage listener printing per-stage wall time, shuffle bytes and
  * spill bytes, so the TaskMemoryManager spill cycle is attributed to a
  * concrete stage (adjacency self-join vs pair aggregate vs candidate
  * build). Optional arg 2 overrides spark.sql.shuffle.partitions to
  * price the obvious lever.
  *
  * Usage: runMain graft.G23Diag <sfDir> [shufflePartitions] [runs]
  */
object G23Diag {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/sf1")
    val parts = args.lift(1).getOrElse("32")
    val runs = args.lift(2).map(_.toInt).getOrElse(2)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val m = si.taskMetrics
        val ms = si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L)
        if (ms > 500 || m.memoryBytesSpilled > 0)
          println(f"[stage ${si.stageId}%4d] ${ms / 1000.0}%7.1fs " +
            f"spillMem=${m.memoryBytesSpilled / 1e9}%6.2fGB " +
            f"spillDisk=${m.diskBytesSpilled / 1e9}%6.2fGB " +
            f"shufW=${m.shuffleWriteMetrics.bytesWritten / 1e9}%6.2fGB " +
            f"shufR=${m.shuffleReadMetrics.totalBytesRead / 1e9}%6.2fGB  " +
            si.name.takeWhile(_ != '\n').take(90))
      }
    })
    val fn = SparkEntry.queries("g23_link_predict")
    (1 to runs).foreach { i =>
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      println(f"[g23 run $i] parts=$parts total=${(System.nanoTime() - t0) / 1e9}%.1f s")
      spark.catalog.clearCache()
      System.gc()
    }
    spark.stop()
  }
}
