package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.StreamAnomaly
import graft.streaming.StreamAnomaly.{MomentState, ValueEvent}

class StreamAnomalySpec extends SparkSpec {
  import spark.implicits._

  private def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")

  // 20 unremarkable alternating values, then one wild spike
  private def calm(idFrom: Long): Seq[ValueEvent] =
    (0 until 20).map(i => ValueEvent(ts(i + 1), idFrom + i, "m",
      if (i % 2 == 0) 10.0 else 12.0))

  test("spike flags once warmed up; calm traffic stays silent; state is per type") {
    implicit val sq = spark.sqlContext
    val in = MemoryStream[ValueEvent]
    val q = StreamAnomaly.anomalies(in.toDS(), k = 3.0, minN = 10)
      .writeStream.format("memory").queryName("anom")
      .outputMode(OutputMode.Append()).start()
    in.addData(calm(1): _*)
    q.processAllAvailable()
    in.addData(
      ValueEvent(ts(30), 100, "m", 1000.0),  // wild vs mean 11, sd ~1
      ValueEvent(ts(31), 101, "m", 11.0),    // unremarkable
      ValueEvent(ts(30), 102, "other", 999.0)) // cold type: minN guard
    q.processAllAvailable()
    val rows = spark.sql("SELECT event_id, z FROM anom")
      .as[(Long, Double)].collect().toMap
    assert(rows.keySet == Set(100L), s"only the warmed-up spike flags: $rows")
    assert(rows(100L) > 3.0)
    q.stop()
  }

  test("stream result equals the sequential batch replay of the shared fold") {
    implicit val sq = spark.sqlContext
    val evs = calm(1) ++ Seq(
      ValueEvent(ts(25), 50, "m", 40.0),
      ValueEvent(ts(26), 51, "m", 11.0),
      ValueEvent(ts(27), 52, "m", -20.0))
    val in = MemoryStream[ValueEvent]
    val q = StreamAnomaly.anomalies(in.toDS(), k = 3.0, minN = 10)
      .writeStream.format("memory").queryName("anomreplay")
      .outputMode(OutputMode.Append()).start()
    // one event per micro-batch: arrival order IS event-time order
    evs.foreach { e => in.addData(e); q.processAllAvailable() }
    val streamed = spark.sql("SELECT event_id, z FROM anomreplay")
      .as[(Long, Double)].collect().toMap
    val (_, batch) = StreamAnomaly.foldAnomalies(
      MomentState(0L, 0.0, 0.0), evs, 3.0, 10L)
    assert(streamed == batch.map(a => a.event_id -> a.z).toMap,
      s"stream $streamed != replay $batch")
    assert(batch.nonEmpty, "scenario must actually flag something")
    q.stop()
  }
}
