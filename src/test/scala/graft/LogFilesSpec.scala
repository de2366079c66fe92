package graft

import org.apache.spark.sql.functions._
import graft.sources.LogFiles

/** Round-trip: Sweep (B1/B2) writes a reference-format run tree; LogFiles
  * (A1/A2/A3/A10/R1 over real files) reads it back. */
class LogFilesSpec extends SparkSpec {
  import spark.implicits._

  private lazy val root: String = {
    val dir = java.nio.file.Files.createTempDirectory("sweeproot").toString
    val cfgs = Sweep.grid(Seq("100mb", "1G"), Seq(0.2, 0.5), reps = 1)
    Sweep.runSweep(dir, cfgs, "20251128_192422") { cfg =>
      (Seq((0, 0, 0), (30, 50, 0), (60, 100, 32), (90, 100, 100)),
        Map("Map input records" -> 325576L, "Reduce shuffle bytes" -> 45810576L))
    }
    dir
  }

  test("B1/B2: sweep creates the reference run-dir convention") {
    val dirs = new java.io.File(root).listFiles().map(_.getName).sorted
    assert(dirs.toList === List("_100mb_slowstart_0.2", "_100mb_slowstart_0.5",
      "_1G_slowstart_0.2", "_1G_slowstart_0.5"))
  }

  test("A10: scan parses dims from both dataset units, uppercased") {
    val lines = LogFiles.readLines(spark, s"$root/*/*/monitor.log")
    val dims = LogFiles.withRunDims(lines)
      .select("dataset", "slowstart").distinct()
      .as[(String, Double)].collect().toSet
    assert(dims === Set(("100MB", 0.2), ("100MB", 0.5), ("1G", 0.2), ("1G", 0.5)))
  }

  test("A1/A2: monitor samples sessionize by delimiter per file") {
    val s = LogFiles.monitorSamples(
      LogFiles.readLines(spark, s"$root/_100mb_slowstart_0.2/*/monitor.log"))
    val steps = s.select("time_step").distinct().as[Int].collect().sorted
    assert(steps.toList === List(0, 1, 2))
    assert(s.count() === 9) // 3 nodes × 3 steps
    val cpus = s.where(col("time_step") === 0).select("cpu")
      .as[Double].collect().sorted
    assert(cpus.toList === List(10.0, 20.0, 30.0))
  }

  test("A3: progress events parse with event-time ordering") {
    val ev = LogFiles.progressEvents(
      LogFiles.readLines(spark, s"$root/_1G_slowstart_0.5/*/job_output.log"))
      .orderBy("ts")
      .select("map_pct", "red_pct").as[(Int, Int)].collect().toList
    assert(ev === List((0, 0), (50, 0), (100, 32), (100, 100)))
  }

  test("R1: counter rows parse from the counter block") {
    val c = LogFiles.counterRows(
      LogFiles.readLines(spark, s"$root/_100mb_slowstart_0.5/*/job_output.log"))
      .as[(String, String, Long)].collect()
      .map(r => r._2 -> r._3).toMap
    assert(c === Map("Map input records" -> 325576L,
      "Reduce shuffle bytes" -> 45810576L))
  }

  test("R7: result CSV sink writes a single headered file, overwrite-safe") {
    import graft.operators.Relational
    val out = java.nio.file.Files.createTempDirectory("csvout").toString + "/result_raw"
    val df = LogFiles.cpuTrends(spark, root)
    Relational.writeResultCsv(df, out)
    Relational.writeResultCsv(df, out) // idempotent overwrite
    val files = new java.io.File(out).listFiles().filter(_.getName.endsWith(".csv"))
    assert(files.length === 1)
    val lines = scala.io.Source.fromFile(files.head).getLines().toList
    assert(lines.head === "dataset,slowstart,time_step,cpu")
    assert(lines.length === df.count() + 1)
  }

  test("A10-A13 full pipeline: cpuTrends over the swept tree") {
    val t = LogFiles.cpuTrends(spark, root)
    val row = t.where(col("dataset") === "100MB" && col("slowstart") === 0.2 &&
      col("time_step") === 0).select("cpu").as[Double].head()
    assert(row === 20.0) // mean of 10, 20, 30
  }
}
