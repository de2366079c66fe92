package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming ingestion of the monitor feed (SURVEY.md §2.E
  * [EXT] stretch).
  *
  * The reference's monitor is an append-only log consumed in batch; the
  * streaming analog treats each sample line as an event with event-time:
  * readStream → parse → watermark → tumbling-window cluster averages, and
  * a stateful per-node sessionizer (flatMapGroupsWithState) that assigns
  * Time_Steps from delimiter lines exactly like the batch A2 operator.
  *
  * At scale the same topology runs against a Kafka/file-source feed from
  * thousands of nodes: state is keyed per node (bounded), windows are
  * watermark-expired, and the sinks are append-mode — nothing grows
  * without bound.
  */
object MonitorStream {

  final case class MonitorLine(run: String, ts: java.sql.Timestamp, line: String)
  final case class Sample(ts: java.sql.Timestamp, node: String,
      cpu: Double, mem: Double)
  final case class SteppedSample(run: String, node: String, time_step: Long,
      cpu: Double)

  private val pat = "\\[(\\w+-\\w+)\\] CPU: ([\\d.]+)% \\| MEM: (\\d+)%"

  /** File-source ingestion: tail a monitor-log directory as a stream.
    * Arrival time stands in for event time (the reference's monitor lines
    * carry no timestamps); downstream windowing is identical either way. */
  def fileLines(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.text(dir)
      .select(current_timestamp().as("ts"), col("value").as("line"))

  /** Parse a stream of (ts, line) into typed samples; non-sample lines
    * (headers, delimiters) are dropped here but kept by the sessionizer. */
  def samples(lines: DataFrame): DataFrame =
    lines.select(col("ts"),
      regexp_extract(col("line"), pat, 1).as("node"),
      when(regexp_extract(col("line"), pat, 2) === "", lit(null))
        .otherwise(regexp_extract(col("line"), pat, 2)).cast("double").as("cpu"),
      when(regexp_extract(col("line"), pat, 3) === "", lit(null))
        .otherwise(regexp_extract(col("line"), pat, 3)).cast("double").as("mem"))
      .where(col("node") =!= "")

  /** Tumbling-window per-node averages with a watermark for stragglers
    * (the streaming analog of A12's per-step cluster mean). */
  def windowedClusterAvg(samples: DataFrame, windowLen: String,
      watermark: String): DataFrame =
    samples.withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen), col("node"))
      .agg(avg(col("cpu")).as("avg_cpu"), avg(col("mem")).as("avg_mem"),
        count(lit(1)).as("n_samples"))

  /** Gap-based session windows per node (the streaming analog of the
    * batch a2b gap sessionizer, via the NATIVE session_window operator:
    * state merges adjacent windows and expires with the watermark — no
    * custom state code, and the same plan covers the SURVEY §2.E
    * "session-per-job" stretch with the run id as the key). */
  def sessionWindows(samples: DataFrame, gap: String,
      watermark: String): DataFrame =
    samples.withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap), col("node"))
      .agg(count(lit(1)).as("n_samples"), avg(col("cpu")).as("avg_cpu"))
      .select(col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("node"), col("n_samples"), col("avg_cpu"))

  /** Streaming stage detection (A5-A8 as a LIVE query): fold arriving
    * progress events into the same fixed-size `StageBuf` the batch
    * [[graft.plans.StageAggregator]] uses and emit the refreshed
    * `StageTimes` for the run after every trigger — the dashboard view of
    * "where is this job right now". State is one O(1) buffer per run;
    * exactly the batch semantics (same reduce, same finish), so batch and
    * streaming answers can never drift. */
  def stageTimes(events: Dataset[graft.plans.StageAggregator.ProgressEvent])
      : Dataset[(String, graft.plans.StageAggregator.StageTimes)] = {
    import events.sparkSession.implicits._
    import graft.plans.StageAggregator
    events.groupByKey(_.run)
      .mapGroupsWithState[StageAggregator.StageBuf,
        (String, StageAggregator.StageTimes)](GroupStateTimeout.NoTimeout()) {
        case (run, evs, state: GroupState[StageAggregator.StageBuf]) =>
          val buf = evs.foldLeft(
            state.getOption.getOrElse(StageAggregator.agg.zero))(
            StageAggregator.agg.reduce)
          state.update(buf)
          (run, StageAggregator.agg.finish(buf))
      }
  }

  /** Stateful delimiter sessionization (streaming A2): per run (= one
    * monitor feed, the batch per-file key), count `----` lines seen so
    * far and tag every sample with the current step. State is one long
    * per run — bounded, and runs are independent so the stream scales by
    * run count exactly like the batch scan scales by file count. */
  def sessionize(lines: Dataset[MonitorLine]): Dataset[SteppedSample] = {
    import lines.sparkSession.implicits._
    lines.groupByKey(_.run)
      .flatMapGroupsWithState[Long, SteppedSample](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (run, rows, state: GroupState[Long]) =>
          var step = state.getOption.getOrElse(0L)
          val out = rows.toSeq.sortBy(_.ts.getTime).flatMap { l =>
            if (l.line.startsWith("----")) { step += 1; None }
            else pat.r.findFirstMatchIn(l.line)
              .map(g => SteppedSample(run, g.group(1), step, g.group(2).toDouble))
          }
          state.update(step)
          out.iterator
      }
  }
}
