package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.MonitorStream
import graft.streaming.MonitorStream.{MonitorLine, SteppedSample}

class MonitorStreamSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Int) = Timestamp.valueOf(f"2025-11-28 19:24:$s%02d")

  test("streaming windowed cluster averages with watermark") {
    implicit val sq = spark.sqlContext
    val in = MemoryStream[MonitorLine]
    val q = MonitorStream.windowedClusterAvg(
      MonitorStream.samples(in.toDF()), "10 seconds", "30 seconds")
      .writeStream.format("memory").queryName("winavg")
      .outputMode(OutputMode.Complete()).start()
    in.addData(
      MonitorLine("r1", ts(1), "[worker1-a] CPU: 10.00% | MEM: 21%"),
      MonitorLine("r1", ts(2), "[worker1-a] CPU: 30.00% | MEM: 23%"),
      MonitorLine("r1", ts(3), "----"),
      MonitorLine("r1", ts(11), "[worker1-a] CPU: 50.00% | MEM: 25%"))
    q.processAllAvailable()
    val rows = spark.sql("SELECT node, avg_cpu, n_samples FROM winavg ORDER BY avg_cpu")
      .as[(String, Double, Long)].collect().toList
    q.stop()
    assert(rows === List(("worker1-a", 20.0, 2L), ("worker1-a", 50.0, 1L)))
  }

  test("file-source stream ingests and parses a real monitor.log directory") {
    val dir = java.nio.file.Files.createTempDirectory("monstream").toString
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/monitor.log"),
      """===== Real Performance Monitor Started =====
        |[worker1-zzh] CPU: 10.00% | MEM: 21%
        |[worker2-zrt] CPU: 36.00% | MEM: 28%
        |----
        |[worker1-zzh] CPU: 55.00% | MEM: 22%
        |""".stripMargin)
    val q = MonitorStream.samples(MonitorStream.fileLines(spark, dir))
      .writeStream.format("memory").queryName("filesrc")
      .outputMode(OutputMode.Append()).start()
    q.processAllAvailable()
    val rows = spark.sql("SELECT node, cpu, mem FROM filesrc ORDER BY cpu")
      .as[(String, Double, Double)].collect().toList
    q.stop()
    assert(rows === List(("worker1-zzh", 10.0, 21.0),
      ("worker2-zrt", 36.0, 28.0), ("worker1-zzh", 55.0, 22.0)))
  }

  test("stateful sessionizer assigns time steps across micro-batches") {
    implicit val sq = spark.sqlContext
    val in = MemoryStream[MonitorLine]
    val q = MonitorStream.sessionize(in.toDS())
      .writeStream.format("memory").queryName("sess")
      .outputMode(OutputMode.Append()).start()
    in.addData(
      MonitorLine("r1", ts(1), "[worker1-a] CPU: 10.00% | MEM: 21%"),
      MonitorLine("r1", ts(2), "----"))
    q.processAllAvailable()
    in.addData( // state (step=1) must survive into the next micro-batch
      MonitorLine("r1", ts(3), "[worker1-a] CPU: 30.00% | MEM: 22%"),
      MonitorLine("r2", ts(4), "[worker2-b] CPU: 40.00% | MEM: 23%"))
    q.processAllAvailable()
    val rows = spark.sql("SELECT run, node, time_step, cpu FROM sess ORDER BY cpu")
      .as[(String, String, Long, Double)].collect().toList
    q.stop()
    assert(rows === List(
      ("r1", "worker1-a", 0L, 10.0),
      ("r1", "worker1-a", 1L, 30.0),
      ("r2", "worker2-b", 0L, 40.0)))
  }
}
