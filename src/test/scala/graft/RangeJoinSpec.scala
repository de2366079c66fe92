package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import graft.operators.RangeJoin

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val intervals = Seq(
    (1L, 100L, ts("2024-01-01 00:00:00"), ts("2024-01-01 00:30:00")),
    (1L, 101L, ts("2024-01-01 00:20:00"), ts("2024-01-01 00:50:00")), // overlaps 100
    (2L, 102L, ts("2024-01-01 00:00:00"), ts("2024-01-01 01:00:00"))
  ).toDF("user_id", "iv_id", "start_ts", "end_ts")

  private val points = Seq(
    (1L, 200L, ts("2024-01-01 00:10:00")), // only iv 100
    (1L, 201L, ts("2024-01-01 00:25:00")), // ivs 100 and 101
    (1L, 202L, ts("2024-01-01 00:30:00")), // end-exclusive: only iv 101
    (1L, 203L, ts("2024-01-01 02:00:00")), // no iv
    (2L, 204L, ts("2024-01-01 00:59:59")), // iv 102, crosses a bucket boundary
    (3L, 205L, ts("2024-01-01 00:10:00"))  // key with no intervals
  ).toDF("user_id", "event_id", "ts")

  private def matches(bucketSec: Long) =
    RangeJoin.pointInInterval(points, intervals, "user_id", "ts",
        "start_ts", "end_ts", bucketSec)
      .select(col("iv_id"), col("pt_event_id"))
      .as[(Long, Long)].collect().toSet

  private val expected = Set(
    (100L, 200L), (100L, 201L), (101L, 201L), (101L, 202L), (102L, 204L))

  test("contains exactly the point-in-[start,end) matches") {
    assert(matches(1800L) === expected)
  }

  test("result is independent of the bucket width") {
    assert(matches(60L) === expected)
    assert(matches(7200L) === expected)
  }

  test("inverted interval (end < start) matches nothing and explodes zero buckets") {
    // without the end >= start guard, sequence() counts DOWNWARD and an
    // inverted interval fans out |diff| junk bucket rows before the
    // residual predicate kills them — it must cost nothing instead
    val inverted = intervals.union(Seq(
      (1L, 999L, ts("2024-01-02 00:00:00"), ts("2024-01-01 00:00:00"))
    ).toDF("user_id", "iv_id", "start_ts", "end_ts"))
    val got = RangeJoin.pointInInterval(points, inverted, "user_id", "ts",
        "start_ts", "end_ts", 1800L)
      .select(col("iv_id"), col("pt_event_id"))
      .as[(Long, Long)].collect().toSet
    assert(got === expected)
  }

  test("plan is an equality join, not a nested-loop cross product") {
    val plan = RangeJoin.pointInInterval(points, intervals, "user_id", "ts",
      "start_ts", "end_ts", 1800L).queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"))
  }
}
