package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import graft.operators.AsOf

class AsOfSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val quotes = Seq(
    (1L, ts("2024-01-01 00:00:00"), 10L, 1.0),
    (1L, ts("2024-01-01 00:00:10"), 11L, 2.0),
    (1L, ts("2024-01-01 00:00:10"), 12L, 3.0), // tie on ts → higher tie wins
    (2L, ts("2024-01-01 00:00:05"), 13L, 9.0)
  ).toDF("key", "ts", "event_id", "value")

  private val trades = Seq(
    (1L, ts("2024-01-01 00:00:05"), 20L),  // after first quote
    (1L, ts("2024-01-01 00:00:10"), 21L),  // equal ts → inclusive, tie 12 wins
    (2L, ts("2024-01-01 00:00:01"), 22L),  // before any quote → null
    (3L, ts("2024-01-01 00:00:01"), 23L)   // key with no quotes → null
  ).toDF("key", "ts", "event_id")

  private def run() =
    AsOf.asofLatest(trades, quotes, "key", "ts", "event_id", "value", "v")
      .select("event_id", "v").as[(Long, Option[Double])].collect().toMap

  test("as-of picks the latest right row at-or-before the left ts") {
    val got = run()
    assert(got(20L) === Some(1.0))
    assert(got(21L) === Some(3.0)) // inclusive at equal ts, tie-broken by event_id
  }

  test("left rows with no prior right row get null") {
    val got = run()
    assert(got(22L) === None)
    assert(got(23L) === None)
  }

  test("a null-valued right ROW wins as most recent (row semantics)") {
    val nullQuotes = Seq(
      (1L, ts("2024-01-01 00:00:00"), 10L, Some(1.0)),
      (1L, ts("2024-01-01 00:00:10"), 11L, None) // most recent row, null value
    ).toDF("key", "ts", "event_id", "value")
    val oneTrade = Seq((1L, ts("2024-01-01 00:00:20"), 20L))
      .toDF("key", "ts", "event_id")
    val got = AsOf.asofLatest(oneTrade, nullQuotes, "key", "ts", "event_id",
        "value", "v")
      .select("event_id", "v").as[(Long, Option[Double])].collect().toMap
    assert(got(20L) === None, "must return the latest ROW's null, not a stale 1.0")
  }

  test("plan is a single window pass — no join, one exchange") {
    val plan = AsOf.asofLatest(trades, quotes, "key", "ts", "event_id",
      "value", "v").queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), "as-of must not plan a range join")
    assert("Exchange".r.findAllIn(plan).length <= 1)
  }

  private def runNext() =
    AsOf.asofNext(trades, quotes, "key", "ts", "event_id", "value", "v")
      .select("event_id", "v").as[(Long, Option[Double])].collect().toMap

  test("forward as-of picks the earliest right row at-or-after the left ts") {
    val got = runNext()
    assert(got(20L) === Some(2.0),
      "next quote after 00:05 is the 00:10 pair; ties break ASC → event 11")
    assert(got(21L) === Some(2.0), "equal ts is inclusive, earliest tie wins")
    assert(got(22L) === Some(9.0), "key 2's only quote is ahead of the trade")
  }

  test("forward as-of: left rows with no following right row get null") {
    val got = runNext()
    assert(got(23L) === None, "key with no quotes at all")
    val lateTrade = Seq((1L, ts("2024-01-01 00:00:30"), 24L))
      .toDF("key", "ts", "event_id")
    val g2 = AsOf.asofNext(lateTrade, quotes, "key", "ts", "event_id",
        "value", "v")
      .select("event_id", "v").as[(Long, Option[Double])].collect().toMap
    assert(g2(24L) === None, "trade after the last quote has no successor")
  }

  test("tolerance as-of: stale matches become null, fresh ones survive") {
    val lateTrades = Seq(
      (1L, ts("2024-01-01 00:00:12"), 30L),  // 2s after quote 12 -> fresh
      (1L, ts("2024-01-01 00:01:30"), 31L))  // 80s after -> stale at tol=10
      .toDF("key", "ts", "event_id")
    val got = AsOf.asofWithin(lateTrades, quotes, "key", "ts", "event_id",
        "value", "v", 10L)
      .select("event_id", "v").as[(Long, Option[Double])].collect().toMap
    assert(got(30L) === Some(3.0))
    assert(got(31L) === None, "match older than the tolerance must be null")
    // tolerance=inf degenerates to plain asofLatest
    val loose = AsOf.asofWithin(lateTrades, quotes, "key", "ts", "event_id",
        "value", "v", 1000000L)
      .select("event_id", "v").as[(Long, Option[Double])].collect().toMap
    val plain = AsOf.asofLatest(lateTrades, quotes, "key", "ts", "event_id",
        "value", "v")
      .select("event_id", "v").as[(Long, Option[Double])].collect().toMap
    assert(loose === plain)
  }

  test("forward as-of plan is also join-free with one exchange") {
    val plan = AsOf.asofNext(trades, quotes, "key", "ts", "event_id",
      "value", "v").queryExecution.executedPlan.toString
    assert(!plan.contains("Join"))
    assert("Exchange".r.findAllIn(plan).length <= 1)
  }
}
