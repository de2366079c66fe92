package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming soak harness (VERDICT r16 item 7): drives the §2.E lanes
  * against a rate source for a sustained interval and records the
  * numbers the 100 TB design claim needs attached — processed rows/s,
  * state-store rows/bytes (the bounded-memory contract of
  * dropDuplicatesWithinWatermark and windowed aggregation), and
  * watermark lag (is event time keeping up with arrival). Writes ONE
  * machine-readable artifact, STREAMING_SOAK.json.
  *
  * Pipelines soaked (the state-bearing representatives):
  *  - stream_dedup: [[graft.streaming.StreamDedup.dedupStream]] over a
  *    synthetic doc stream with a built-in duplicate rate (every 5
  *    consecutive ids share a text), watermark 10 s — state must
  *    plateau at ~unique-texts-per-watermark, not grow with the stream.
  *  - monitor_window: [[graft.streaming.MonitorStream.windowedClusterAvg]]
  *    over synthetic 8-node monitor samples (10 s tumbling windows,
  *    5 s watermark) — the A12 lane live.
  *  - monitor_sessions: [[graft.streaming.MonitorStream.sessionWindows]]
  *    (native session_window state with gap merge) on the same samples.
  *
  * Usage: runMain graft.StreamSoak [seconds]   (default 60)
  * Env: SPARK_GRAFT_SOAK_RPS — source rows/sec (default 20000).
  */
object StreamSoak {
  def main(args: Array[String]): Unit = {
    val secs = args.headOption.map(_.toInt).getOrElse(60)
    val rps = sys.env.getOrElse("SPARK_GRAFT_SOAK_RPS", "20000").toLong
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def rate(): DataFrame = spark.readStream.format("rate")
      .option("rowsPerSecond", rps.toString)
      .option("rampUpTime", "0s").load()

    // ~20% unique: every 5 consecutive ids share one text, so the dedup
    // state carries one norm per 5 source rows per watermark interval
    val docStream = rate().select(
      col("timestamp").as("ts"), col("value").as("doc_id"),
      concat(lit("sample document body text number "),
        (col("value") - (col("value") % 5)).cast("string")).as("text"))
    val sampleStream = rate().select(
      col("timestamp").as("ts"),
      concat(lit("node-"), (col("value") % 8).cast("string")).as("node"),
      ((col("value") % 100).cast("double")).as("cpu"),
      ((col("value") % 97).cast("double")).as("mem"))

    def fmt(v: Double): String =
      BigDecimal(v).setScale(3, BigDecimal.RoundingMode.HALF_UP)
        .underlying.stripTrailingZeros.toPlainString

    def soak(name: String, df: DataFrame): String = {
      val ckpt = java.nio.file.Files
        .createTempDirectory(s"graft_soak_$name").toString
      val q = df.writeStream.format("noop")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.ProcessingTime("1 second"))
        .start()
      try Thread.sleep(secs * 1000L) finally q.stop()
      q.awaitTermination()
      val ps = q.recentProgress.filter(_.numInputRows > 0)
      val rows = ps.map(_.numInputRows).sum
      val execMs = ps.flatMap(p =>
        Option(p.durationMs.get("triggerExecution")).map(_.toLong)).sum
      val throughput = if (execMs > 0) rows * 1000.0 / execMs else 0.0
      val lastState = ps.lastOption.toSeq.flatMap(_.stateOperators)
      val stateRows = lastState.map(_.numRowsTotal).sum
      val stateBytes = lastState.map(_.memoryUsedBytes).sum
      // bounded-state evidence: the PEAK state row count across the run —
      // a plateau reads peak ≈ final; state growing with the stream
      // would read peak ≫ watermark-window bound and final ≈ peak ∝ input
      val peakStateRows =
        (0L +: ps.map(_.stateOperators.map(_.numRowsTotal).sum)).max
      val maxBatchMs = (0L +: ps.flatMap(p =>
        Option(p.durationMs.get("triggerExecution")).map(_.toLong))).max
      // watermark lag: batch wall-clock timestamp minus the watermark it
      // carried — how far event-time completeness trails arrival
      val lags = ps.flatMap { p =>
        val wm = Option(p.eventTime.get("watermark")).filter(_.nonEmpty)
          .map(java.time.Instant.parse(_).toEpochMilli)
          .filter(_ > 0L) // first batches carry the unset epoch-0 watermark
        wm.map(java.time.Instant.parse(p.timestamp).toEpochMilli - _)
      }
      val maxLagMs = (0L +: lags).max
      graft.sources.Bucketing.purgeDir(java.nio.file.Paths.get(ckpt))
      s""""$name":{"n_batches":${ps.length},"input_rows":$rows,""" +
        s""""processed_rows_per_sec":${fmt(throughput)},""" +
        s""""max_batch_ms":$maxBatchMs,"state_rows":$stateRows,""" +
        s""""peak_state_rows":$peakStateRows,""" +
        s""""state_bytes":$stateBytes,"max_watermark_lag_ms":$maxLagMs}"""
    }

    val parts = Seq(
      soak("stream_dedup",
        graft.streaming.StreamDedup.dedupStream(docStream, "10 seconds")),
      soak("monitor_window",
        graft.streaming.MonitorStream
          .windowedClusterAvg(sampleStream, "10 seconds", "5 seconds")),
      soak("monitor_sessions",
        graft.streaming.MonitorStream
          .sessionWindows(sampleStream, "3 seconds", "5 seconds")))

    val line = s"""{"metric":"streaming_soak","duration_s":$secs,""" +
      s""""source_rows_per_sec":$rps,"cpus":$cpus,""" +
      s""""pipelines":{${parts.mkString(",")}}}"""
    println(line)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("STREAMING_SOAK.json"), line + "\n")
    spark.stop()
  }
}
