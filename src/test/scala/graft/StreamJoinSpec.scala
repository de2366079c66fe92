package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.StreamJoin

// top-level so both the MemoryStream and the Seq(...).toDF encoders work
final case class View(user_id: Long, view_ts: Timestamp, page: String)
final case class Buy(user_id: Long, buy_ts: Timestamp, amount: Double)

class StreamJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(m: Int, s: Int) =
    Timestamp.valueOf(f"2024-01-01 00:$m%02d:$s%02d")

  private val views = Seq(
    View(1L, ts(0, 0), "home"),   // matched twice within horizon
    View(1L, ts(5, 0), "search"), // purchase outside horizon
    View(2L, ts(1, 0), "item"),   // matched once
    View(3L, ts(2, 0), "home"))   // never purchases
  private val buys = Seq(
    Buy(1L, ts(0, 30), 10.0),
    Buy(1L, ts(1, 30), 20.0),
    Buy(1L, ts(9, 0), 99.0),      // 4 min after view 2 — outside 2 min
    Buy(2L, ts(2, 59), 5.0))

  test("stream-stream interval join matches batch join exactly") {
    implicit val sq = spark.sqlContext
    val vIn = MemoryStream[View]
    val bIn = MemoryStream[Buy]
    val q = StreamJoin.attributionJoin(vIn.toDF(), bIn.toDF(),
        "2 minutes", "30 seconds")
      .writeStream.format("memory").queryName("attr")
      .outputMode(OutputMode.Append()).start()
    vIn.addData(views: _*)
    bIn.addData(buys: _*)
    q.processAllAvailable()
    val streamed = spark.sql(
      "SELECT user_id, page, amount, lag_sec FROM attr")
      .as[(Long, String, Double, Long)].collect().toSet
    q.stop()
    val batch = StreamJoin.attributionJoinBatch(
        views.toDF(), buys.toDF(), "2 minutes")
      .select("user_id", "page", "amount", "lag_sec")
      .as[(Long, String, Double, Long)].collect().toSet
    assert(streamed === batch, "stream and batch answers drifted")
    assert(batch === Set(
      (1L, "home", 10.0, 30L),
      (1L, "home", 20.0, 90L),
      (2L, "item", 5.0, 119L)),
      "horizon must include in-window purchases and exclude the 4-min one")
  }

  test("left-outer emits un-attributed views exactly once, after the watermark") {
    implicit val sq = spark.sqlContext
    val vIn = MemoryStream[View]
    val bIn = MemoryStream[Buy]
    val q = StreamJoin.attributionJoin(vIn.toDF(), bIn.toDF(),
        "2 minutes", "10 seconds", "left_outer")
      .writeStream.format("memory").queryName("attr_lo")
      .outputMode(OutputMode.Append()).start()
    vIn.addData(views: _*)
    bIn.addData(buys: _*)
    q.processAllAvailable()
    // flush: advance BOTH watermarks far past every view_ts + horizon
    vIn.addData(View(99L, ts(30, 0), "flush"))
    bIn.addData(Buy(99L, ts(30, 0), 0.0))
    q.processAllAvailable()
    val nulls = spark.sql(
      "SELECT user_id, page FROM attr_lo WHERE buy_ts IS NULL")
      .as[(Long, String)].collect().toList.sorted
    q.stop()
    assert(nulls === List((1L, "search"), (3L, "home")),
      "exactly the horizon-missed and purchase-free views emit null rows")
  }
}
