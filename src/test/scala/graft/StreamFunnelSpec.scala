package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.StreamFunnel
import graft.streaming.StreamFunnel.FunnelEvent

class StreamFunnelSpec extends SparkSpec {
  import spark.implicits._

  private def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")

  test("live stages advance strictly and match the batch funnel answer") {
    implicit val sq = spark.sqlContext
    val in = MemoryStream[FunnelEvent]
    val q = StreamFunnel.liveStages(in.toDS())
      .toDF("user_id", "stage")
      .writeStream.format("memory").queryName("livefunnel")
      .outputMode(OutputMode.Update()).start()
    // same scenario as the batch FunnelSpec strictness test, split
    // across micro-batches
    in.addData(
      FunnelEvent(ts(1), 1, "view"), FunnelEvent(ts(2), 1, "click"),
      FunnelEvent(ts(1), 2, "view"),
      FunnelEvent(ts(1), 3, "click"))
    q.processAllAvailable()
    in.addData(
      FunnelEvent(ts(3), 1, "purchase"),   // completes user 1
      FunnelEvent(ts(2), 2, "purchase"),   // purchase BEFORE any click
      FunnelEvent(ts(3), 2, "click"),      // click after the purchase
      FunnelEvent(ts(2), 3, "purchase"))   // never viewed
    q.processAllAvailable()
    // the memory sink appends one row per micro-batch per touched user;
    // stages only advance, so the latest state is the max
    val stages = spark.sql(
      "SELECT user_id, max(stage) FROM livefunnel GROUP BY user_id ORDER BY user_id")
      .as[(Long, Int)].collect().toList
    q.stop()
    // batch semantics: u1 full convert; u2 view+click only (purchase
    // preceded the click); u3 nothing (click had no prior view)
    assert(stages === List((1L, 3), (2L, 2), (3L, 0)))

    // cross-check against the batch operator on the same events
    val all = Seq(
      (ts(1), 1L, "view"), (ts(2), 1L, "click"), (ts(3), 1L, "purchase"),
      (ts(1), 2L, "view"), (ts(2), 2L, "purchase"), (ts(3), 2L, "click"),
      (ts(1), 3L, "click"), (ts(2), 3L, "purchase"))
      .toDF("ts", "user_id", "event_type")
    val b = operators.Funnel.funnelConversion(all).collect().head
    assert(b.getAs[Long]("n_view") == 2L)               // u1, u2 (stage>=1)
    assert(b.getAs[Long]("n_click_after_view") == 2L)   // u1, u2 (stage>=2)
    assert(b.getAs[Long]("n_purchase_funnel") == 1L)    // u1 only (stage 3)
  }

  test("stream stages equal the sequential batch replay of the shared state machine") {
    // the StreamAnomaly replay discipline: one event per micro-batch in
    // event-time order, final per-user stage must equal ONE sequential
    // fold of the shared FunnelState.advance — micro-batch boundaries
    // and state-store round-trips must not change where a user lands
    implicit val sq = spark.sqlContext
    val evs = Seq(
      FunnelEvent(ts(1), 1, "view"), FunnelEvent(ts(2), 2, "view"),
      FunnelEvent(ts(3), 1, "click"), FunnelEvent(ts(4), 3, "click"),
      FunnelEvent(ts(5), 2, "click"), FunnelEvent(ts(6), 1, "purchase"),
      FunnelEvent(ts(7), 3, "view"), FunnelEvent(ts(8), 2, "purchase"),
      FunnelEvent(ts(9), 3, "click"), FunnelEvent(ts(10), 4, "purchase"))
    val in = MemoryStream[FunnelEvent]
    val q = StreamFunnel.liveStages(in.toDS())
      .toDF("user_id", "stage")
      .writeStream.format("memory").queryName("funnel_replay")
      .outputMode(OutputMode.Update()).start()
    evs.foreach { e => in.addData(e); q.processAllAvailable() }
    val streamed = spark.sql(
      "SELECT user_id, max(stage) FROM funnel_replay GROUP BY user_id")
      .as[(Long, Int)].collect().toMap
    q.stop()
    val replay = evs.groupBy(_.user_id).map { case (u, es) =>
      u -> es.sortBy(_.ts.getTime)
        .foldLeft(StreamFunnel.FunnelState(None, None, None))(_.advance(_))
        .stage
    }
    assert(streamed === replay, s"stream $streamed != replay $replay")
    assert(replay(1L) == 3 && replay(2L) == 3 && replay(3L) == 2 && replay(4L) == 0)
  }
}
