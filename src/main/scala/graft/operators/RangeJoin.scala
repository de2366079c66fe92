package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Q, Tables}

/** Point-in-interval (range) join — match each point row to the interval
  * rows that contain its timestamp, without the cross-product a plain
  * inequality join plans (Spark turns `l.ts BETWEEN r.start AND r.end`
  * into BroadcastNestedLoopJoin / cartesian + filter, which is quadratic
  * per key and a non-starter at 100 TB).
  *
  * Scale design: time is cut into fixed-width buckets. Each interval is
  * exploded into the buckets it covers (`sequence(floor(start/w),
  * floor(end/w))` — bounded fan-out when intervals are short relative to
  * the bucket width), each point gets its single bucket, and the join
  * becomes an EQUALITY join on (key, bucket) followed by the exact
  * residual predicate. That is shuffle-hash-joinable, AQE-skew-splittable,
  * and linear in (points + interval-bucket fan-out).
  */
object RangeJoin {

  /** Inner-join `points` to the containing `intervals` on
    * `keyCol` equality and `startCol <= pointTs < endCol`.
    * Interval columns survive as-is; point columns are prefixed `pt_`.
    * `bucketSec` should be >= the typical interval length so the
    * per-interval fan-out stays at 1-2 buckets. */
  def pointInInterval(points: DataFrame, intervals: DataFrame, keyCol: String,
                      pointTs: String, startCol: String, endCol: String,
                      bucketSec: Long): DataFrame = {
    val pt = points.columns.foldLeft(points)((d, c) =>
      d.withColumnRenamed(c, s"pt_$c"))
      .withColumn("__bucket",
        (unix_timestamp(col(s"pt_$pointTs")) / bucketSec).cast("long"))
    // guard malformed intervals (end < start): sequence() would count
    // DOWNWARD, generating |diff| bucket rows of pure fan-out that the
    // residual predicate then discards — an inverted interval can match
    // nothing, so it should cost nothing
    val iv = intervals
      .where(col(endCol) >= col(startCol))
      .withColumn("__bucket",
        explode(sequence(
          (unix_timestamp(col(startCol)) / bucketSec).cast("long"),
          (unix_timestamp(col(endCol)) / bucketSec).cast("long"))))
    iv.join(pt,
        iv("__bucket") === pt("__bucket") &&
          col(keyCol) === col(s"pt_$keyCol") &&
          col(s"pt_$pointTs") >= col(startCol) &&
          col(s"pt_$pointTs") < col(endCol))
      .drop("__bucket")
  }
}

object RangeJoinQueries {
  val qs: Seq[Q] = Seq(
    Q("r8_range_join",
      (s, d) => {
        val ev = Tables.events(s, d)
        val errors = ev.where(col("event_type") === "error")
          .select(col("event_id"), col("user_id"), col("ts").as("start_ts"),
            (col("ts") + expr("INTERVAL 1800 SECONDS")).as("end_ts"))
        val clicks = ev.where(col("event_type") === "click")
          .select(col("user_id"), col("ts"), col("event_id"))
        val joined = RangeJoin.pointInInterval(clicks, errors,
          "user_id", "ts", "start_ts", "end_ts", bucketSec = 1800L)
        // left join back so error events with zero in-window clicks keep a row
        errors.select("event_id", "user_id")
          .join(joined.groupBy("event_id")
              .agg(count(lit(1)).as("n_clicks")),
            Seq("event_id"), "left")
          .select(col("event_id"), col("user_id"),
            coalesce(col("n_clicks"), lit(0L)).as("n_clicks"))
          .orderBy("event_id")
      },
      Some("""SELECT e.event_id, e.user_id, count(c.event_id) AS n_clicks
             |FROM events e LEFT JOIN events c
             |  ON c.user_id = e.user_id AND c.event_type = 'click'
             | AND c.ts >= e.ts AND c.ts < e.ts + INTERVAL 1800 SECOND
             |WHERE e.event_type = 'error'
             |GROUP BY e.event_id, e.user_id ORDER BY e.event_id""".stripMargin),
      doc = "range join: clicks within 30 min after each error, bucketized " +
        "equality join on (user, time-bucket) + exact residual — no cross product"),
  )
}
