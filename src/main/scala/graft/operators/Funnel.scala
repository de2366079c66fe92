package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Q, Tables}

/** Behavioral-sequence operators over the events stream (extends
  * SURVEY.md §2.A's sessionization family): event-transition bigrams
  * (the Markov transition counts behind "what happens after X?") and a
  * strict sequential conversion funnel.
  *
  * Design for 100 TB:
  *  - Both operators shuffle ONCE on user_id; transitions then reduce to
  *    |event_type|^2 rows and the funnel to one row per user before the
  *    final tiny aggregate — map-side partials take care of the rest.
  *  - The funnel's per-stage timestamps are windowed conditional mins
  *    over the same partition spec, so Catalyst evaluates all three
  *    stages in a single Window operator chain without re-shuffling.
  *  - Event-time ties are broken by event_id, keeping the transition
  *    sequence deterministic (same discipline as a4_event_order).
  */
object Funnel {

  /** (prev_type, event_type) bigram counts per user-ordered stream. */
  def eventTransitions(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    events.select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .where(col("prev_type").isNotNull)
      .groupBy("prev_type", "event_type")
      .agg(count(lit(1)).as("n"))
  }

  /** F3: gap-based sessionization over the events stream — the classic
    * web-analytics operator the monitor-log delimiter sessionizer (A2)
    * approximates with explicit markers: a session breaks wherever a
    * user's inter-event gap exceeds `gapSec`. One row per (user,
    * session) with its event count and wall-clock span.
    *
    * Scale shape: ONE shuffle on user_id; the lag, the running
    * session-id sum, and the final per-session groupBy all share that
    * partitioning (the window partition key is bounded by per-user
    * event counts, never a global key). Gap arithmetic is exact long
    * seconds (floored epochs, the c1/r8 discipline), and event-time
    * ties break on event_id so the session assignment is
    * deterministic. */
  def gapSessions(events: DataFrame, gapSec: Long): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    events.select(col("user_id"), col("ts"), col("event_id"))
      .withColumn("prev_ts", lag(col("ts"), 1).over(w))
      .withColumn("new_sess",
        when(col("prev_ts").isNull ||
          unix_timestamp(col("ts")) - unix_timestamp(col("prev_ts")) > gapSec,
          1L).otherwise(0L))
      .withColumn("session_id", sum(col("new_sess")).over(w))
      .groupBy("user_id", "session_id")
      .agg(count(lit(1)).as("n_events"),
        (unix_timestamp(max(col("ts"))) - unix_timestamp(min(col("ts"))))
          .as("duration_sec"))
  }

  /** Strict sequential funnel: first 'view', then the first 'click'
    * AFTER that view, then the first 'purchase' AFTER that click.
    * Output: one row of per-stage user counts. */
  def funnelConversion(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id")
    val staged = events
      .select(col("user_id"), col("ts"), col("event_type"))
      .withColumn("tv",
        min(when(col("event_type") === "view", col("ts"))).over(w))
      .withColumn("tc",
        min(when(col("event_type") === "click" && col("ts") > col("tv"),
          col("ts"))).over(w))
      .withColumn("tp",
        min(when(col("event_type") === "purchase" && col("ts") > col("tc"),
          col("ts"))).over(w))
      .groupBy("user_id")
      .agg(min("tv").as("tv"), min("tc").as("tc"), min("tp").as("tp"))
    staged.agg(
      count(lit(1)).as("n_users"),
      sum(when(col("tv").isNotNull, 1L).otherwise(0L)).as("n_view"),
      sum(when(col("tc").isNotNull, 1L).otherwise(0L)).as("n_click_after_view"),
      sum(when(col("tp").isNotNull, 1L).otherwise(0L)).as("n_purchase_funnel"))
  }
}

object FunnelQueries {
  import Funnel._

  val qs: Seq[Q] = Seq(
    Q("f1_event_transitions",
      (s, d) => eventTransitions(Tables.events(s, d))
        .orderBy("prev_type", "event_type"),
      Some("""WITH o AS (
             |  SELECT user_id, event_type,
             |         lag(event_type) OVER (PARTITION BY user_id
             |           ORDER BY ts, event_id) AS prev_type
             |  FROM events)
             |SELECT prev_type, event_type, count(*) AS n
             |FROM o WHERE prev_type IS NOT NULL
             |GROUP BY prev_type, event_type
             |ORDER BY prev_type, event_type""".stripMargin),
      doc = "per-user event-transition bigram counts (Markov transition table)"),

    Q("f2_funnel_conversion",
      (s, d) => funnelConversion(Tables.events(s, d)),
      Some("""WITH a AS (
             |  SELECT user_id, ts, event_type,
             |         min(CASE WHEN event_type = 'view' THEN ts END)
             |           OVER (PARTITION BY user_id) AS tv
             |  FROM events),
             |b AS (
             |  SELECT *, min(CASE WHEN event_type = 'click' AND ts > tv THEN ts END)
             |              OVER (PARTITION BY user_id) AS tc
             |  FROM a),
             |c AS (
             |  SELECT *, min(CASE WHEN event_type = 'purchase' AND ts > tc THEN ts END)
             |              OVER (PARTITION BY user_id) AS tp
             |  FROM b),
             |u AS (SELECT user_id, min(tv) AS tv, min(tc) AS tc, min(tp) AS tp
             |      FROM c GROUP BY user_id)
             |SELECT count(*) AS n_users,
             |       CAST(sum(CASE WHEN tv IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_view,
             |       CAST(sum(CASE WHEN tc IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_click_after_view,
             |       CAST(sum(CASE WHEN tp IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase_funnel
             |FROM u""".stripMargin),
      doc = "strict sequential view->click->purchase funnel: windowed " +
        "conditional mins, one shuffle on user_id"),

    Q("f3_gap_sessions",
      (s, d) => gapSessions(Tables.events(s, d), 21600L)
        .orderBy("user_id", "session_id"),
      Some("""WITH l AS (
             |  SELECT user_id, event_id, ts,
             |         CASE WHEN lag(ts) OVER w IS NULL
             |              OR CAST(floor(epoch(ts)) AS BIGINT)
             |                 - CAST(floor(epoch(lag(ts) OVER w)) AS BIGINT) > 21600
             |              THEN 1 ELSE 0 END AS new_sess
             |  FROM events
             |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
             |s AS (
             |  SELECT user_id, ts,
             |         CAST(sum(new_sess) OVER (PARTITION BY user_id
             |           ORDER BY ts, event_id) AS BIGINT) AS session_id
             |  FROM l)
             |SELECT user_id, session_id, count(*) AS n_events,
             |       CAST(floor(epoch(max(ts))) AS BIGINT)
             |         - CAST(floor(epoch(min(ts))) AS BIGINT) AS duration_sec
             |FROM s GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),
      doc = "gap-based sessionization (6 h inactivity break): lag + " +
        "running session-id sum + per-session rollup, all on ONE " +
        "user_id shuffle; exact long-second gaps, event_id tiebreak"),
  )
}
