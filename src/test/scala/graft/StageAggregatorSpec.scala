package graft

import graft.plans.StageAggregator
import graft.plans.StageAggregator.{ProgressEvent, StageTimes}

class StageAggregatorSpec extends SparkSpec {
  import spark.implicits._

  private def run(events: (Long, Int, Int)*): StageTimes = {
    val ds = events.map { case (t, m, r) => ProgressEvent("r1", t, m, r) }.toDS()
    StageAggregator.stageTimes(ds).collect().head._2
  }

  test("golden: full map→shuffle→reduce progression (reference A5-A8 rules)") {
    // t=0 start; map done at t=60; red>0 at t=40; map=100∧red≥90 at t=80; end t=100
    val st = run((0, 0, 0), (40, 80, 10), (60, 100, 32), (80, 100, 90), (100, 100, 100))
    assert(st.totalS === 100.0)
    assert(st.mapS === 60.0)
    assert(st.shuffleS === 40.0) // 80 - 40
    assert(st.reduceS === 20.0)  // 100 - 80
    // overlap of [0,60] with [40,80] = 20 → 20/40 = 50%
    assert(st.overlapPct === 50.0)
  }

  test("no red>=90 match: 2nd-from-end fallback ends the shuffle (:112-119)") {
    val st = run((0, 0, 0), (40, 100, 10), (70, 100, 40), (100, 100, 50))
    assert(st.shuffleS === 30.0) // fallback = 2nd-to-last = 70; 70 - 40
    assert(st.reduceS === 0.0)   // tShufEnd genuinely unset
  }

  test("single event: degenerate everything-zero (:117-119, :131-133)") {
    val st = run((50, 0, 0))
    assert(st === StageTimes(0.0, 0.0, 0.0, 0.0, 0.0))
  }

  test("zero-length shuffle yields 0 overlap (division guard)") {
    val st = run((0, 0, 0), (40, 100, 95), (40, 100, 96), (60, 100, 100))
    assert(st.overlapPct === 0.0)
  }

  test("one-pass aggregator agrees with the conditional-aggregate plan") {
    // derive progress analogs from the events table the same way both ways
    val ev = Tables.events(spark, sf("sf0.001"))
    import org.apache.spark.sql.functions._
    val progress = ev.select(
      col("user_id").cast("string").as("run"),
      unix_timestamp(col("ts")).as("epochS"),
      when(col("event_type") === "purchase", 100).otherwise(col("event_id") % 100)
        .cast("int").as("mapPct"),
      when(col("value") > 5, 91).otherwise(0).cast("int").as("redPct"))
      .as[ProgressEvent]
    val typed = StageAggregator.stageTimes(progress).collect()
      .map { case (r, st) => r -> st.totalS }.toMap
    val sqlTotals = ev.groupBy(col("user_id").cast("string").as("run"))
      .agg((max(unix_timestamp(col("ts"))) - min(unix_timestamp(col("ts"))))
        .cast("double").as("total"))
      .as[(String, Double)].collect().toMap
    assert(typed === sqlTotals)
  }
}
