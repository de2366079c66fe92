package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StructField, StructType}

import graft.{Q, Tables}

/** As-of (backward) join — for each left row, the most recent right row
  * with `ts` at-or-before the left row's `ts`, per key.
  *
  * The reference has no such operator (its closest analog is pandas
  * event-time alignment in `analyze/common_utils.py:77-119`), but it is
  * the canonical time-series primitive a telemetry workload like the
  * reference's monitor/progress logs needs (e.g. "cluster CPU at the
  * moment each progress event fired").
  *
  * Scale design: the naive formulation is a range join (`l.ts >= r.ts`)
  * whose physical plan is a per-key cross product — quadratic in samples
  * per key. This implementation instead UNIONS the tagged sides and takes
  * a running `last(value, ignoreNulls)` over a single
  * `Window.partitionBy(key).orderBy(ts, side, tie)` — ONE shuffle, linear
  * work, and the window is whole-stage-codegen'd. At 100 TB this is the
  * difference between a broadcast-range-join blowup and a plain sort-merge
  * pass. Right rows sort before left rows at equal `ts` (side 0 < 1), so
  * a right row at exactly the left timestamp is included; ties among
  * right rows are broken by `tie` (the later one wins).
  */
object AsOf {

  /** Left columns are preserved; the right `valueCol` arrives as `outCol`
    * (null when no right row precedes the left row). `key`, `ts`, and
    * `tieBreak` must exist on both sides.
    *
    * Row semantics, not value semantics: the right value is wrapped in a
    * single-field struct before the running `last(_, ignoreNulls)`, so a
    * right ROW whose value is null still wins as "most recent row" and
    * yields null (matching pandas merge_asof) instead of being skipped in
    * favor of a stale earlier value. */
  def asofLatest(left: DataFrame, right: DataFrame, key: String, ts: String,
                 tieBreak: String, valueCol: String, outCol: String): DataFrame =
    asofBackward(left, right, key, ts, tieBreak, valueCol, outCol, None)

  /** [[asofLatest]] with a max-staleness bound: the matched value is
    * null unless the most recent right row lies within `tolSec` seconds
    * of the left timestamp (pandas merge_asof `tolerance`). Same single
    * union+window plan — the matched row's OWN timestamp rides along in
    * the running struct, so the staleness test is a projection, not a
    * second join. */
  def asofWithin(left: DataFrame, right: DataFrame, key: String, ts: String,
                 tieBreak: String, valueCol: String, outCol: String,
                 tolSec: Long): DataFrame =
    asofBackward(left, right, key, ts, tieBreak, valueCol, outCol, Some(tolSec))

  private def asofBackward(left: DataFrame, right: DataFrame, key: String,
                           ts: String, tieBreak: String, valueCol: String,
                           outCol: String, tolSec: Option[Long]): DataFrame = {
    val lCols = left.columns.toSeq
    val vType = right.schema(valueCol).dataType
    val tsType = right.schema(ts).dataType
    val rvType = StructType(Seq(StructField("v", vType), StructField("rts", tsType)))
    val l = left.select(
      col(key).as("__k"), col(ts).as("__ts"), lit(1).as("__side"),
      col(tieBreak).as("__tie"), lit(null).cast(rvType).as("__rv"),
      struct(lCols.map(col): _*).as("__l"))
    val lStructType = l.schema("__l").dataType
    val r = right.select(
      col(key).as("__k"), col(ts).as("__ts"), lit(0).as("__side"),
      col(tieBreak).as("__tie"),
      struct(col(valueCol).as("v"), col(ts).as("rts")).as("__rv"),
      lit(null).cast(lStructType).as("__l"))
    val w = Window.partitionBy("__k")
      .orderBy(col("__ts"), col("__side"), col("__tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = last(col("__rv"), ignoreNulls = true).over(w)
    val out = tolSec match {
      case None => matched.getField("v")
      case Some(t) => when(
        unix_timestamp(col("__ts")) - unix_timestamp(matched.getField("rts")) <= t,
        matched.getField("v"))
    }
    l.unionByName(r)
      .withColumn(outCol, out)
      .where(col("__side") === 1)
      .select(lCols.map(c => col("__l").getField(c).as(c)) :+ col(outCol): _*)
  }

  /** Forward as-of: for each left row, the EARLIEST right row with `ts`
    * at-or-after the left row's `ts`, per key — "next reading after the
    * event". Same single-window shape as [[asofLatest]], mirrored: left
    * rows sort BEFORE right rows at equal ts (side 0 < 1) so a right row
    * at exactly the left timestamp matches, the frame runs forward
    * (currentRow → unboundedFollowing), and `first(_, ignoreNulls)` picks
    * the nearest following right row. Ties among right rows break by
    * `tieBreak` ascending (the earlier one wins). ONE shuffle, no range
    * join — identical scale story to the backward variant. */
  def asofNext(left: DataFrame, right: DataFrame, key: String, ts: String,
               tieBreak: String, valueCol: String, outCol: String): DataFrame = {
    val lCols = left.columns.toSeq
    val vType = right.schema(valueCol).dataType
    val rvType = StructType(Seq(StructField("v", vType)))
    val l = left.select(
      col(key).as("__k"), col(ts).as("__ts"), lit(0).as("__side"),
      col(tieBreak).as("__tie"), lit(null).cast(rvType).as("__rv"),
      struct(lCols.map(col): _*).as("__l"))
    val lStructType = l.schema("__l").dataType
    val r = right.select(
      col(key).as("__k"), col(ts).as("__ts"), lit(1).as("__side"),
      col(tieBreak).as("__tie"), struct(col(valueCol).as("v")).as("__rv"),
      lit(null).cast(lStructType).as("__l"))
    val w = Window.partitionBy("__k")
      .orderBy(col("__ts"), col("__side"), col("__tie"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    l.unionByName(r)
      .withColumn(outCol,
        first(col("__rv"), ignoreNulls = true).over(w).getField("v"))
      .where(col("__side") === 0)
      .select(lCols.map(c => col("__l").getField(c).as(c)) :+ col(outCol): _*)
  }
}

object AsOfQueries {
  val qs: Seq[Q] = Seq(
    Q("a20_asof_within",
      (s, d) => {
        val ev = Tables.events(s, d)
        val purchases = ev.where(col("event_type") === "purchase")
          .select("event_id", "user_id", "ts")
        val views = ev.where(col("event_type") === "view")
          .select("event_id", "user_id", "ts", "value")
        AsOf.asofWithin(purchases, views, "user_id", "ts", "event_id",
            "value", "asof_value", 300L)
          .select("event_id", "user_id", "asof_value")
          .orderBy("event_id")
      },
      Some("""WITH u AS (
             |  SELECT user_id, ts, 1 AS side, event_id, event_id AS tie,
             |         CAST(NULL AS STRUCT(v DOUBLE, rts TIMESTAMP)) AS rv
             |  FROM events WHERE event_type = 'purchase'
             |  UNION ALL
             |  SELECT user_id, ts, 0 AS side, NULL AS event_id, event_id AS tie,
             |         struct_pack(v := value, rts := ts) AS rv
             |  FROM events WHERE event_type = 'view'),
             |j AS (
             |  SELECT event_id, user_id, side, ts,
             |         last_value(rv IGNORE NULLS)
             |           OVER (PARTITION BY user_id ORDER BY ts, side, tie
             |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS m
             |  FROM u)
             |SELECT event_id, user_id,
             |       CASE WHEN epoch(ts) - epoch(m.rts) <= 300 THEN m.v END AS asof_value
             |FROM j WHERE side = 1 ORDER BY event_id""".stripMargin),
      doc = "as-of join with max-staleness tolerance (pandas merge_asof " +
        "tolerance): the matched row's own timestamp rides in the running " +
        "struct, so the bound is a projection — still ONE window, no join"),

    Q("a18_asof_value",
      (s, d) => {
        val ev = Tables.events(s, d)
        val purchases = ev.where(col("event_type") === "purchase")
          .select("event_id", "user_id", "ts")
        val views = ev.where(col("event_type") === "view")
          .select("event_id", "user_id", "ts", "value")
        AsOf.asofLatest(purchases, views, "user_id", "ts", "event_id",
            "value", "asof_value")
          .select("event_id", "user_id", "asof_value")
          .orderBy("event_id")
      },
      Some("""WITH u AS (
             |  SELECT user_id, ts, 1 AS side, event_id, event_id AS tie,
             |         CAST(NULL AS STRUCT(v DOUBLE)) AS rv
             |  FROM events WHERE event_type = 'purchase'
             |  UNION ALL
             |  SELECT user_id, ts, 0 AS side, NULL AS event_id, event_id AS tie,
             |         struct_pack(v := value) AS rv
             |  FROM events WHERE event_type = 'view'),
             |j AS (
             |  SELECT event_id, user_id, side,
             |         (last_value(rv IGNORE NULLS)
             |           OVER (PARTITION BY user_id ORDER BY ts, side, tie
             |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)).v AS asof_value
             |  FROM u)
             |SELECT event_id, user_id, asof_value
             |FROM j WHERE side = 1 ORDER BY event_id""".stripMargin),
      doc = "as-of join: latest prior 'view' value per user at each " +
        "'purchase' (union + running last-non-null; one shuffle, no range join)"),

    Q("a19_asof_next",
      (s, d) => {
        val ev = Tables.events(s, d)
        val errors = ev.where(col("event_type") === "error")
          .select("event_id", "user_id", "ts")
        val clicks = ev.where(col("event_type") === "click")
          .select("event_id", "user_id", "ts", "value")
        AsOf.asofNext(errors, clicks, "user_id", "ts", "event_id",
            "value", "next_value")
          .select("event_id", "user_id", "next_value")
          .orderBy("event_id")
      },
      Some("""WITH u AS (
             |  SELECT user_id, ts, 0 AS side, event_id, event_id AS tie,
             |         CAST(NULL AS STRUCT(v DOUBLE)) AS rv
             |  FROM events WHERE event_type = 'error'
             |  UNION ALL
             |  SELECT user_id, ts, 1 AS side, NULL AS event_id, event_id AS tie,
             |         struct_pack(v := value) AS rv
             |  FROM events WHERE event_type = 'click'),
             |j AS (
             |  SELECT event_id, user_id, side,
             |         (first_value(rv IGNORE NULLS)
             |           OVER (PARTITION BY user_id ORDER BY ts, side, tie
             |                 ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)).v AS next_value
             |  FROM u)
             |SELECT event_id, user_id, next_value
             |FROM j WHERE side = 0 ORDER BY event_id""".stripMargin),
      doc = "forward as-of join: earliest following 'click' value per user " +
        "at each 'error' (mirrored single-window shape, one shuffle)"),
  )
}
