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

  test("native session windows split on the gap and merge within it") {
    implicit val sq = spark.sqlContext
    val in = MemoryStream[MonitorLine]
    val q = MonitorStream.sessionWindows(
      MonitorStream.samples(in.toDF()), "5 seconds", "0 seconds")
      .writeStream.format("memory").queryName("sessions")
      .outputMode(OutputMode.Complete()).start()
    in.addData(
      MonitorLine("r1", ts(1), "[worker1-a] CPU: 10.00% | MEM: 21%"),
      MonitorLine("r1", ts(3), "[worker1-a] CPU: 20.00% | MEM: 22%"),
      // 17s gap > 5s session gap -> new session
      MonitorLine("r1", ts(20), "[worker1-a] CPU: 40.00% | MEM: 23%"))
    q.processAllAvailable()
    val rows = spark.sql(
      "SELECT n_samples, avg_cpu FROM sessions ORDER BY session_start")
      .as[(Long, Double)].collect().toList
    q.stop()
    assert(rows === List((2L, 15.0), (1L, 40.0)),
      "close samples must merge into one session, the far one must split")
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

  test("streaming stage detection matches the batch aggregator across micro-batches") {
    import graft.plans.StageAggregator.ProgressEvent
    implicit val sq = spark.sqlContext
    val in = MemoryStream[ProgressEvent]
    val q = MonitorStream.stageTimes(in.toDS())
      .writeStream.format("memory").queryName("stages")
      .outputMode(OutputMode.Update()).start()
    in.addData(
      ProgressEvent("r1", 100L, 0, 0),
      ProgressEvent("r1", 110L, 50, 0))
    q.processAllAvailable()
    in.addData( // state must carry: map done + shuffle end arrive later
      ProgressEvent("r1", 120L, 100, 10),
      ProgressEvent("r1", 130L, 100, 95),
      ProgressEvent("r1", 140L, 100, 100))
    q.processAllAvailable()
    val got = spark.sql("SELECT _1, _2.* FROM stages")
      .as[(String, Double, Double, Double, Double, Double)].collect()
      .groupBy(_._1).map { case (k, vs) => k -> vs.last }
    // batch answer over the full event list
    val batch = Seq(
      ProgressEvent("r1", 100L, 0, 0), ProgressEvent("r1", 110L, 50, 0),
      ProgressEvent("r1", 120L, 100, 10), ProgressEvent("r1", 130L, 100, 95),
      ProgressEvent("r1", 140L, 100, 100))
      .foldLeft(graft.plans.StageAggregator.agg.zero)(
        graft.plans.StageAggregator.agg.reduce)
    val bt = graft.plans.StageAggregator.agg.finish(batch)
    q.stop()
    val (_, totalS, mapS, shuffleS, reduceS, overlapPct) = got("r1")
    assert((totalS, mapS, shuffleS, reduceS, overlapPct) ===
      ((bt.totalS, bt.mapS, bt.shuffleS, bt.reduceS, bt.overlapPct)))
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
