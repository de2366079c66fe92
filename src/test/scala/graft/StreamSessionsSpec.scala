package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.StreamSessions

class StreamSessionsSpec extends SparkSpec {
  import spark.implicits._

  final case class Ev(ts: Timestamp, user_id: Long, value: Double)
  private def ts(m: Int, s: Int) = Timestamp.valueOf(f"2024-01-01 00:$m%02d:$s%02d")

  test("gap sessions extend, finalize at watermark, and end at last+gap") {
    implicit val sq = spark.sqlContext
    val in = MemoryStream[Ev]
    val q = StreamSessions.userSessions(in.toDF(), "5 minutes", "10 seconds")
      .writeStream.format("memory").queryName("sessions")
      .outputMode(OutputMode.Append()).start()
    // user 1: two events 2 min apart -> ONE session; user 2: one event
    in.addData(Ev(ts(0, 0), 1L, 1.0), Ev(ts(2, 0), 1L, 2.5),
      Ev(ts(1, 0), 2L, 4.0))
    q.processAllAvailable()
    assert(spark.sql("SELECT count(*) FROM sessions").as[Long].head() === 0L,
      "open sessions must not emit before the watermark closes them")
    // far-future event closes everything open
    in.addData(Ev(ts(30, 0), 9L, 0.0))
    q.processAllAvailable()
    val got = spark.sql(
      "SELECT user_id, sess_start, sess_end, n_events, sum_value FROM sessions")
      .as[(Long, Timestamp, Timestamp, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    q.stop()
    assert(got(1L) === ((ts(0, 0), ts(7, 0), 2L, 3.5)),
      "user 1's events must merge into one session ending last-event+gap")
    assert(got(2L) === ((ts(1, 0), ts(6, 0), 1L, 4.0)))
  }

  test("a late event inside the gap extends the open session") {
    implicit val sq = spark.sqlContext
    val in = MemoryStream[Ev]
    val q = StreamSessions.userSessions(in.toDF(), "5 minutes", "1 minute")
      .writeStream.format("memory").queryName("sessions2")
      .outputMode(OutputMode.Append()).start()
    in.addData(Ev(ts(0, 0), 1L, 1.0))
    q.processAllAvailable()
    // arrives in a later batch but within the gap: same session
    in.addData(Ev(ts(4, 0), 1L, 1.0))
    q.processAllAvailable()
    in.addData(Ev(ts(30, 0), 9L, 0.0))
    q.processAllAvailable()
    val sess = spark.sql(
      "SELECT sess_start, sess_end, n_events FROM sessions2 WHERE user_id = 1")
      .as[(Timestamp, Timestamp, Long)].collect()
    q.stop()
    assert(sess.toSeq === Seq((ts(0, 0), ts(9, 0), 2L)),
      "cross-batch events within the gap must merge into one session")
  }
  test("finalized sessions equal the batch session_window replay of the same expression") {
    // replay discipline for the session-window shape: append-mode
    // finalized rows must equal the SAME groupBy(session_window)
    // expression run in batch over the same events
    implicit val sq = spark.sqlContext
    val evs = Seq(
      Ev(ts(0, 0), 1L, 1.0), Ev(ts(2, 0), 1L, 2.5), Ev(ts(9, 0), 1L, 4.0),
      Ev(ts(1, 0), 2L, 4.0), Ev(ts(8, 0), 2L, 1.0))
    val in = MemoryStream[Ev]
    val q = StreamSessions.userSessions(in.toDF(), "5 minutes", "10 seconds")
      .writeStream.format("memory").queryName("sessions_replay")
      .outputMode(OutputMode.Append()).start()
    in.addData(evs: _*)
    q.processAllAvailable()
    in.addData(Ev(ts(40, 0), 9L, 0.0)) // watermark past every open session
    q.processAllAvailable()
    val streamed = spark.sql(
      "SELECT user_id, sess_start, sess_end, n_events, sum_value " +
        "FROM sessions_replay WHERE user_id <> 9")
      .as[(Long, Timestamp, Timestamp, Long, Double)].collect().toSet
    q.stop()
    val batch = StreamSessions.userSessions(
        evs.map(e => (e.ts, e.user_id, e.value)).toDF("ts", "user_id", "value"),
        "5 minutes", "10 seconds")
      .as[(Timestamp, Timestamp, Long, Long, Double)].collect()
      .map(r => (r._3, r._1, r._2, r._4, r._5)).toSet
    assert(streamed === batch, s"stream $streamed != batch replay $batch")
    assert(batch.size === 4, "both users split at the 5-min gap (7-min holes)")
  }

}
