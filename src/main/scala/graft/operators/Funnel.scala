package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.{Q, Tables}
import graft.functions.Parity.pround

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

  /** f6: first-order Markov transition matrix — f1's bigram counts
    * row-normalized into estimated transition probabilities
    * P(next | prev), the model behind next-action prediction and
    * behavioral-drift monitors (compare matrices across releases).
    *
    * Scale shape: everything heavy is f1 (one user_id shuffle reducing
    * to |types|² rows); the row totals are a second tiny rollup of that
    * bounded table and join back as a broadcast. The probability is a
    * shared-tree division over exact counts. */
  def markovMatrix(events: DataFrame): DataFrame = {
    // EAGER (r19): the |types|²-row transition table feeds both the row
    // totals and the probability projection — without storage the
    // user_id window + count shuffle ran once per consumer.
    val t = Materialize.frame(eventTransitions(events))
    val tot = t.groupBy("prev_type").agg(sum("n").as("row_n"))
    t.join(broadcast(tot), "prev_type")
      .select(col("prev_type"), col("event_type"), col("n"),
        pround(col("n").cast("double") / col("row_n").cast("double"), 9)
          .as("p_next"))
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

  /** f7: session-depth histogram — the engagement distribution (how many
    * sessions are one-shot bounces vs long reads) every product dashboard
    * derives from f3's sessions. Output is one row per observed depth
    * with its session count and share.
    *
    * Scale shape: f3 already reduces the facts to one row per session on
    * a single user_id shuffle; this is a second combinable rollup of
    * that table to |distinct depths| rows, with the total joined back as
    * a broadcast one-row aggregate. */
  def sessionDepthHistogram(events: DataFrame, gapSec: Long): DataFrame = {
    // EAGER (r19): the |distinct depths|-row histogram feeds both the
    // total and the share projection — without storage the f3
    // sessionization (window + two shuffles) ran once per consumer.
    val depth = Materialize.frame(gapSessions(events, gapSec)
      .groupBy("n_events").agg(count(lit(1)).as("n_sessions")))
    val tot = depth.agg(sum("n_sessions").as("t"))
    depth.crossJoin(broadcast(tot))
      .select(col("n_events"), col("n_sessions"),
        pround(col("n_sessions").cast("double") / col("t").cast("double"), 9)
          .as("share"))
      .orderBy("n_events")
  }

  /** f8: last-touch revenue attribution — every purchase's value is
    * credited to the nearest PRECEDING non-purchase event type in the
    * user's stream (the default attribution model in every marketing
    * stack); purchases with no prior touch land in the null bucket
    * rather than silently vanishing, so credited revenue always sums to
    * total purchase revenue.
    *
    * "Most recent preceding" without engine-varying IGNORE NULLS
    * semantics: a running count of non-purchase events partitions each
    * user's stream into segments that share the same last touch, the
    * toucher is the single non-purchase row that OPENED the segment, and
    * purchases join their segment's toucher on (user, segment) — the
    * same user_id-keyed partitioning as the window, so the join adds no
    * new shuffle. Exact cent sums; the a4 event_id tiebreak keeps
    * segment assignment deterministic. */
  def lastTouchAttribution(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val seg = events
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"),
        expr("cast(floor(value * 100.0 + 0.5) as bigint)").as("c"))
      .withColumn("s",
        sum(when(col("event_type") =!= "purchase", 1L).otherwise(0L)).over(w))
    val touch = seg.where(col("event_type") =!= "purchase")
      .select(col("user_id"), col("s"), col("event_type").as("touch_type"))
    seg.where(col("event_type") === "purchase")
      .join(touch, Seq("user_id", "s"), "left")
      .groupBy("touch_type")
      .agg(count(lit(1)).as("n_purchases"), sum("c").as("revenue_cents"))
      .orderBy("touch_type")
  }

  /** f16: first-touch attribution — revenue credited to the user's
    * FIRST-ever non-purchase touch (the acquisition channel), f8's
    * symmetric counterpart: last-touch rewards closers, first-touch
    * rewards acquirers, and the gap between the two tables is the
    * classic attribution dispute made queryable. Scale shape beats
    * f8's: no window at all — the first touch is ONE combinable min_by
    * per user (deterministic (sec, event_id) order), purchases join it
    * on user_id, |channels| rows out. */
  def firstTouchAttribution(events: DataFrame): DataFrame = {
    val base = events.select(col("user_id"), col("event_id"),
      col("event_type"), expr("unix_timestamp(ts)").as("sec"),
      expr("cast(floor(value * 100.0 + 0.5) as bigint)").as("c"))
    val first = base.where(col("event_type") =!= "purchase")
      .groupBy("user_id")
      .agg(min_by(col("event_type"), struct(col("sec"), col("event_id")))
        .as("touch_type"))
    base.where(col("event_type") === "purchase")
      .join(first, Seq("user_id"), "left")
      .groupBy("touch_type")
      .agg(count(lit(1)).as("n_purchases"), sum("c").as("revenue_cents"))
      .orderBy("touch_type")
  }

  /** f10: per-session revenue census — how much does a session monetize?
    * The commerce join of f3's sessionization: per (user, session) the
    * purchase cents collapse in the SAME rollup that counts events (one
    * user_id shuffle total), then the census reduces sessions to one
    * profile row: counts, conversion share, exact revenue, mean per
    * purchasing session, and the bin-convention lower median (the x36
    * discipline — the median window sees |distinct cent values| rows,
    * never sessions). */
  def sessionRevenue(events: DataFrame, gapSec: Long): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val sess = events
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"),
        expr("cast(floor(value * 100.0 + 0.5) as bigint)").as("c"))
      .withColumn("prev_ts", lag(col("ts"), 1).over(w))
      .withColumn("new_sess",
        when(col("prev_ts").isNull ||
          unix_timestamp(col("ts")) - unix_timestamp(col("prev_ts")) > gapSec,
          1L).otherwise(0L))
      .withColumn("session_id", sum(col("new_sess")).over(w))
      .groupBy("user_id", "session_id")
      .agg(sum(when(col("event_type") === "purchase", col("c"))
        .otherwise(0L)).as("rev"))
    val base = sess.agg(count(lit(1)).as("n_sessions"),
      sum(when(col("rev") > 0, 1L).otherwise(0L)).as("n_purchasing"),
      sum("rev").as("revenue_cents"))
    val wm = Window.orderBy("rev")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val med = sess.where(col("rev") > 0)
      .groupBy("rev").agg(count(lit(1)).as("cnt"))
      .withColumn("cum", sum("cnt").over(wm))
      .crossJoin(broadcast(sess.where(col("rev") > 0)
        .agg(count(lit(1)).as("np"))))
      .where(col("cum") >= expr("(np + 1) div 2"))
      .agg(min("rev").as("p50_rev_cents"))
    base.crossJoin(med)
      .select(col("n_sessions"), col("n_purchasing"), col("revenue_cents"),
        pround(col("n_purchasing").cast("double") /
          col("n_sessions").cast("double"), 9).as("purchase_share"),
        pround(expr(meanRevExpr), 6).as("mean_rev_cents"),
        col("p50_rev_cents"))
  }

  // Zero purchasing sessions -> null mean, not ANSI divide-by-zero.
  private[operators] val meanRevExpr =
    "(case when n_purchasing = 0 then cast(null as double) " +
      "else cast(revenue_cents as double) / cast(n_purchasing as double) end)"

  /** f9: stickiness (avg DAU / WAU) per week — the engagement ratio
    * every growth dashboard tracks: 1.0 means every weekly user shows up
    * daily, 1/7 means each appears once. Week/day indexing is pure
    * integer epoch-day arithmetic (f4's convention — engines disagree on
    * week starts, integers cannot).
    *
    * Scale shape: ONE distinct (day, user) reduction feeds both sides —
    * daily actives are a day-keyed rollup, weekly actives a second
    * distinct over the derived week key (strictly smaller input), and
    * the final join is |weeks|-row. */
  def stickiness(events: DataFrame): DataFrame = {
    val du = events
      .select(expr("unix_timestamp(ts) div 86400").as("day"), col("user_id"))
      .distinct()
    val daily = du.groupBy("day").agg(count(lit(1)).as("dau"))
      .select(expr("day div 7").as("wk"), col("dau"))
      .groupBy("wk").agg(sum("dau").as("sum_dau"), count(lit(1)).as("n_days"))
    val weekly = du.select(expr("day div 7").as("wk"), col("user_id"))
      .distinct()
      .groupBy("wk").agg(count(lit(1)).as("wau"))
    daily.join(weekly, "wk")
      .select(col("wk").as("week"), col("n_days"), col("wau"),
        pround(col("sum_dau").cast("double") /
          (col("n_days") * col("wau")).cast("double"), 9).as("stickiness"))
      .orderBy("week")
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

  /** F4: cohort retention matrix — users are cohorted by their
    * first-active week and each cell counts how many of a cohort's users
    * were active `week_offset` weeks later, with the retention ratio
    * against the cohort's own week-0 size. The growth-analytics staple.
    *
    * Week indexing is a pure integer epoch-day division (day div 7 from
    * 1970-01-01, a Thursday — the bucket boundary is arbitrary but
    * identical on both engines), not date_trunc: engines disagree on
    * week-start conventions, integer arithmetic cannot.
    *
    * Scale shape: the fact scan reduces immediately to distinct
    * (user, week) — combinable, and the week column bounds it at
    * |users|·|weeks|. Cohorts derive from THAT table with a second
    * user_id-keyed aggregate, so the cohort join re-uses the same
    * hash partitioning (no new shuffle under AQE's exchange reuse);
    * cells then reduce to |weeks|² rows, and the week-0 denominator
    * join is a broadcast of that bounded cell table. */
  def retentionCohorts(events: DataFrame): DataFrame = {
    val uw = events
      .select(col("user_id"),
        expr("datediff(cast(ts as date), date'1970-01-01') div 7").as("wk"))
      .distinct()
    val cohort = uw.groupBy("user_id").agg(min("wk").as("cw"))
    val cells = uw.join(cohort, "user_id")
      .groupBy(col("cw").as("cohort_week"),
        (col("wk") - col("cw")).as("week_offset"))
      .agg(count(lit(1)).as("n_users"))
    val base = cells.where(col("week_offset") === 0)
      .select(col("cohort_week"), col("n_users").as("n0"))
    cells.join(broadcast(base), "cohort_week")
      .select(col("cohort_week"), col("week_offset"), col("n_users"),
        pround(col("n_users").cast("double") / col("n0").cast("double"), 6)
          .as("retention"))
  }

  /** f5: time-to-convert census — seconds from a user's FIRST `from`
    * event to their FIRST strictly-later `to` event, summarized as a
    * one-row distribution profile (population, converters, mean, lower
    * median). The latency companion to f2's conversion counts: funnels
    * say HOW MANY convert, this says HOW FAST.
    *
    * Scale shape: one user_id-keyed conditional-min aggregate reduces
    * the facts to a row per user (combinable); the median then runs on
    * MINUTE bins of the delta — the x25/x28 domain-bounding discipline,
    * so the single ordered window sees |distinct minutes| rows, never
    * users. The lower median is pinned explicitly (smallest bin whose
    * cumulative count reaches ceil(n/2)) rather than delegated to
    * engine-varying percentile semantics. */
  def timeToConvert(events: DataFrame, from: String = "signup",
                    to: String = "purchase"): DataFrame = {
    val per = events
      .where(col("event_type").isin(from, to))
      .groupBy("user_id")
      .agg(min(when(col("event_type") === from,
          expr("unix_timestamp(ts)"))).as("s"),
        min(when(col("event_type") === to,
          expr("unix_timestamp(ts)"))).as("p"))
    val delta = per
      .where(col("s").isNotNull && col("p").isNotNull && col("p") > col("s"))
      .select((col("p") - col("s")).as("d"))
    val tot = per.agg(count(when(col("s").isNotNull, 1)).as("n_from"))
    val m1 = delta.agg(count(lit(1)).as("nc"), sum("d").as("sd"))
    val wm = Window.orderBy("m")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val med = delta.select(expr("d div 60").as("m"))
      .groupBy("m").agg(count(lit(1)).as("cnt"))
      .withColumn("cum", sum("cnt").over(wm))
      .crossJoin(broadcast(m1.select(col("nc").as("nc2"))))
      .where(col("cum") >= expr("(nc2 + 1) div 2"))
      .agg(min("m").as("p50_delta_min"))
    tot.crossJoin(m1).crossJoin(med)
      .select(col("n_from"), col("nc").as("n_converted"),
        pround(expr(avgDeltaExpr), 6).as("avg_delta_sec"),
        col("p50_delta_min"))
  }

  /** f11: RFM segment census. Per user: recency (days since last event,
    * vs the corpus max day), frequency (event count), monetary (exact
    * purchase cents); each metric maps to a quartile 1..4 and users
    * aggregate per (r,f,m) segment.
    *
    * Quartiles are NOT a per-user ntile — a global single-partition
    * window over |users| rows would serialize 10⁹ rows at warehouse
    * scale. Instead each metric's quartile is assigned BY VALUE from the
    * cumulative count over the |distinct values| table (the x36 median
    * discipline): q = ceil(4·|users ≤ v| / n), computed in pure integers
    * ((4·cum + n − 1) div n) so no float boundary can flip a bucket.
    * Ties share a quartile by construction, which also makes the result
    * engine-order-independent. The three value→quartile maps are
    * distinct-value-sized and broadcast back onto the per-user table. */
  /** f14: inter-event gap census per event type — the traffic-shape
    * read behind retry/backoff and capacity planning (a low CV means
    * metronome traffic; CV ≈ 1 is Poisson; CV >> 1 is bursty sessions).
    * Gaps are consecutive same-user deltas in whole seconds (one
    * user_id window, the same shuffle every session operator pays),
    * attributed to the LATER event's type, then reduced to exact
    * (n, Σg, Σg²) moments per type — DECIMAL sums so 100 TB gap
    * squares cannot overflow — with the CV read off one fixed IEEE
    * tree: cv = √(n·Σg² − (Σg)²)/Σg. */
  def eventGapCensus(events: DataFrame): DataFrame = {
    val dec = DecimalType(38, 0)
    // order by the TRUNCATED second (+ id tiebreak), not the raw ts —
    // sub-second ordering would diverge from the oracle's epoch-second
    // window when two events share a second
    val w = Window.partitionBy("user_id").orderBy(col("sec"), col("event_id"))
    val gaps = events
      .select(col("user_id"), col("event_id"), col("event_type"),
        expr("unix_timestamp(ts)").as("sec"))
      .withColumn("prev", lag("sec", 1).over(w))
      .where(col("prev").isNotNull)
      .select(col("event_type"), (col("sec") - col("prev")).as("g"))
    gaps.groupBy("event_type")
      .agg(count(lit(1)).as("n_gaps"),
        sum(col("g").cast(dec)).as("sg"),
        sum(col("g").cast(dec) * col("g").cast(dec)).as("sgg"))
      .select(col("event_type"), col("n_gaps"),
        pround(expr("cast(sg as double) / cast(n_gaps as double)"), 6)
          .as("mean_gap_s"),
        pround(expr(gapCvExpr), 6).as("cv"))
      .orderBy("event_type")
  }

  // CV tree over the exact decimal moments, shared with the oracle; a
  // zero-sum gap series (all gaps 0) has no defined CV -> null.
  private[operators] val gapCvExpr =
    "(case when sg = 0 then cast(null as double) " +
      "else sqrt(cast(cast(n_gaps as decimal(38,0)) * sgg - sg * sg as double)) " +
      "/ cast(sg as double) end)"

  /** f15: top behavioral 3-paths — the most common consecutive
    * event-type trigrams across user streams ("view > click >
    * purchase" vs "view > click > view"), the raw material of
    * path-to-conversion analysis and the empirical transition check on
    * f6's first-order Markov assumption (a heavy trigram whose
    * probability ≠ product of its f6 edges is memory the chain
    * misses). One user_id window (two lags share it), path strings
    * reduce with map-side combine, top-10 by TakeOrderedAndProject. */
  def topPaths(events: DataFrame, k: Int = 10): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("sec"), col("event_id"))
    events
      .select(col("user_id"), col("event_id"), col("event_type"),
        expr("unix_timestamp(ts)").as("sec"))
      .withColumn("p1", lag("event_type", 1).over(w))
      .withColumn("p2", lag("event_type", 2).over(w))
      .where(col("p2").isNotNull)
      .select(concat_ws(">", col("p2"), col("p1"), col("event_type"))
        .as("path"))
      .groupBy("path").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("path"))
      .limit(k)
  }

  def rfmSegments(events: DataFrame): DataFrame = {
    val per = events
      .select(col("user_id"),
        expr("unix_timestamp(ts) div 86400").as("day"),
        col("event_type"),
        expr("cast(floor(value * 100.0 + 0.5) as bigint)").as("c"))
      .groupBy("user_id")
      .agg(max("day").as("last_day"), count(lit(1)).as("freq"),
        sum(when(col("event_type") === "purchase", col("c"))
          .otherwise(0L)).as("mon"))
      // EAGER (r19): the per-user RFM table feeds the reference row,
      // three quartile maps AND the segment join — five consumers of
      // one fact shuffle; stored it is a |users|-bounded table (the
      // same per-user profile a warehouse persists).
      .transform(Materialize.frame)
    val ref = per.agg(max("last_day").as("ref_day"),
      count(lit(1)).as("n_users"))
    val m = per.crossJoin(broadcast(ref))
      .select(col("user_id"), col("n_users"),
        (col("ref_day") - col("last_day")).as("recency"),
        col("freq"), col("mon"))
    // value -> quartile map for one metric: cumulative count over the
    // ASC-ordered distinct-value table (bounded: recency <= span days,
    // freq small ints, mon distinct cents — the largest is the x36
    // "window over |distinct values| rows" convention)
    def quartileMap(metric: String): DataFrame = {
      val w = Window.orderBy(col("v"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      m.groupBy(col(metric).as("v")).agg(count(lit(1)).as("cnt"))
        .withColumn("cum", sum("cnt").over(w))
        .select(col("v").as(s"${metric}_v"), col("cum").as(s"${metric}_cum"))
    }
    m.join(broadcast(quartileMap("recency")),
        col("recency") === col("recency_v"))
      .join(broadcast(quartileMap("freq")), col("freq") === col("freq_v"))
      .join(broadcast(quartileMap("mon")), col("mon") === col("mon_v"))
      .select(col("user_id"), col("freq"), col("mon"),
        expr("(4 * recency_cum + n_users - 1) div n_users").as("r_q"),
        expr("(4 * freq_cum + n_users - 1) div n_users").as("f_q"),
        expr("(4 * mon_cum + n_users - 1) div n_users").as("m_q"))
      .groupBy("r_q", "f_q", "m_q")
      .agg(count(lit(1)).as("n_users"), sum("mon").as("revenue_cents"),
        pround(avg(col("freq").cast("double")), 6).as("avg_freq"))
      .orderBy("r_q", "f_q", "m_q")
  }

  /** f13: the conversion funnel split by A/B variant — f2's strict
    * sequential funnel per hash-variant (user_id % 2, the same
    * deterministic split x31's z-test uses, so the two queries read the
    * same experiment). Per-user stage times come from the SAME windowed
    * conditional-min chain as f2 (one user_id shuffle); the variant
    * rollup adds a 2-row aggregate and conversion shares. */
  def funnelByVariant(events: DataFrame): DataFrame = {
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
    staged.select((col("user_id") % 2).as("variant"), col("tv"), col("tc"),
        col("tp"))
      .groupBy("variant")
      .agg(count(lit(1)).as("n_users"),
        sum(when(col("tv").isNotNull, 1L).otherwise(0L)).as("n_view"),
        sum(when(col("tc").isNotNull, 1L).otherwise(0L))
          .as("n_click_after_view"),
        sum(when(col("tp").isNotNull, 1L).otherwise(0L))
          .as("n_purchase_funnel"))
      .select(col("variant"), col("n_users"), col("n_view"),
        col("n_click_after_view"), col("n_purchase_funnel"),
        pround(col("n_purchase_funnel").cast("double") /
          col("n_users").cast("double"), 6).as("conversion"))
      .orderBy("variant")
  }

  /** f12: rolling 7-day active users per day — the daily DAU/WAU board
    * (f9 gives the weekly version; this is the per-day rolling read).
    * Each distinct (day, user) activity row fans out to the `window`
    * future days it keeps the user "active" for (a 7× widening of the
    * |day,user| table — bounded, documented, and the standard shape:
    * the alternative per-day range join re-scans activity 7×), then one
    * distinct + count per day. Early days are true partial windows. */
  def rollingActive(events: DataFrame, window: Int = 7): DataFrame = {
    // EAGER (r19): the distinct (day, user) table feeds both the DAU
    // and the exploded WAU rollups — without storage the fact scan and
    // the distinct's shuffle ran once per consumer.
    // Scale bound (ADVICE r19): unlike the other r19 materializations
    // this table is |users × active days| — fact-adjacent, NOT
    // key-space-bounded. It is still ~1/events_per_user_day of the raw
    // stream and two narrow columns, but at extreme scale the
    // localCheckpoint block budget is real; if that bites, drop the
    // Materialize (the two consumers then share one exchange lazily)
    // or gate it on a measured size threshold as g9's edge frame does.
    val du = Materialize.frame(events
      .select(expr("unix_timestamp(ts) div 86400").as("day"), col("user_id"))
      .distinct())
    val dau = du.groupBy("day").agg(count(lit(1)).as("dau"))
    val wau = du
      .select(explode(expr(s"sequence(day, day + ${window - 1})")).as("day"),
        col("user_id"))
      .distinct()
      .groupBy("day").agg(count(lit(1)).as("wau"))
    dau.join(wau, Seq("day")) // days past the stream end have no DAU row
      .select(col("day"), col("dau"), col("wau"),
        pround(col("dau").cast("double") / col("wau").cast("double"), 6)
          .as("dau_wau_ratio"))
      .orderBy("day")
  }

  // Shared with the oracle; zero converters -> null, not ANSI div-by-zero.
  private[operators] val avgDeltaExpr =
    "(case when nc = 0 then cast(null as double) " +
      "else cast(sd as double) / cast(nc as double) end)"
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

    Q("f4_retention_cohorts",
      (s, d) => retentionCohorts(Tables.events(s, d))
        .orderBy("cohort_week", "week_offset"),
      Some("""WITH uw AS (
             |  SELECT DISTINCT user_id,
             |         datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) // 7 AS wk
             |  FROM events),
             |c AS (SELECT user_id, min(wk) AS cw FROM uw GROUP BY 1),
             |cells AS (
             |  SELECT cw AS cohort_week, wk - cw AS week_offset,
             |         count(*) AS n_users
             |  FROM uw JOIN c USING (user_id) GROUP BY 1, 2),
             |b AS (SELECT cohort_week, n_users AS n0 FROM cells
             |      WHERE week_offset = 0)
             |SELECT cohort_week, week_offset, n_users,
             |       floor(CAST(n_users AS DOUBLE) / CAST(n0 AS DOUBLE)
             |             * 1000000.0 + 0.5) / 1000000.0 AS retention
             |FROM cells JOIN b USING (cohort_week)
             |ORDER BY cohort_week, week_offset""".stripMargin),
      doc = "cohort retention matrix (first-active week x week offset): " +
        "distinct (user, week) reduction, partitioning-reusing cohort " +
        "join, bounded cell table, broadcast week-0 denominator"),

    Q("f5_time_to_convert",
      (s, d) => timeToConvert(Tables.events(s, d)),
      Some(s"""WITH per AS (
             |  SELECT user_id,
             |         min(CASE WHEN event_type = 'signup'
             |                  THEN CAST(floor(epoch(ts)) AS BIGINT) END) AS s,
             |         min(CASE WHEN event_type = 'purchase'
             |                  THEN CAST(floor(epoch(ts)) AS BIGINT) END) AS p
             |  FROM events WHERE event_type IN ('signup', 'purchase')
             |  GROUP BY 1),
             |d AS (SELECT p - s AS d FROM per
             |      WHERE s IS NOT NULL AND p IS NOT NULL AND p > s),
             |tot AS (SELECT count(*) AS n_from FROM per WHERE s IS NOT NULL),
             |m1 AS (SELECT count(*) AS nc, CAST(sum(d) AS BIGINT) AS sd FROM d),
             |b AS (SELECT d // 60 AS m, count(*) AS cnt FROM d GROUP BY 1),
             |c AS (SELECT m, sum(cnt) OVER (ORDER BY m ROWS BETWEEN
             |        UNBOUNDED PRECEDING AND CURRENT ROW) AS cum FROM b),
             |med AS (SELECT min(m) AS p50_delta_min FROM c CROSS JOIN m1
             |        WHERE cum >= (nc + 1) // 2)
             |SELECT n_from, nc AS n_converted,
             |       floor(($avgDeltaExpr)
             |             * 1000000.0 + 0.5) / 1000000.0 AS avg_delta_sec,
             |       p50_delta_min
             |FROM tot CROSS JOIN m1 CROSS JOIN med""".stripMargin),
      doc = "time-to-convert census (first signup -> first later " +
        "purchase): per-user conditional-min pass, minute-binned lower " +
        "median so the ordered window sees bins not users"),

    Q("f6_markov_matrix",
      (s, d) => markovMatrix(Tables.events(s, d))
        .orderBy("prev_type", "event_type"),
      Some("""WITH o AS (
             |  SELECT user_id, event_type,
             |         lag(event_type) OVER (PARTITION BY user_id
             |           ORDER BY ts, event_id) AS prev_type
             |  FROM events),
             |t AS (SELECT prev_type, event_type, count(*) AS n
             |      FROM o WHERE prev_type IS NOT NULL GROUP BY 1, 2),
             |r AS (SELECT prev_type, CAST(sum(n) AS BIGINT) AS row_n
             |      FROM t GROUP BY 1)
             |SELECT prev_type, event_type, n,
             |       floor(CAST(n AS DOUBLE) / CAST(row_n AS DOUBLE)
             |             * 1000000000.0 + 0.5) / 1000000000.0 AS p_next
             |FROM t JOIN r USING (prev_type)
             |ORDER BY prev_type, event_type""".stripMargin),
      doc = "first-order Markov transition matrix: f1's bigram counts " +
        "row-normalized P(next|prev) — heavy work is the one user_id " +
        "shuffle, totals are a broadcast rollup of the |types|^2 table"),

    Q("f7_session_depth",
      (s, d) => sessionDepthHistogram(Tables.events(s, d), 21600L),
      Some("""WITH l AS (
             |  SELECT user_id, event_id, ts,
             |         CASE WHEN lag(ts) OVER w IS NULL
             |              OR CAST(floor(epoch(ts)) AS BIGINT)
             |                 - CAST(floor(epoch(lag(ts) OVER w)) AS BIGINT) > 21600
             |              THEN 1 ELSE 0 END AS new_sess
             |  FROM events
             |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
             |s AS (
             |  SELECT user_id,
             |         CAST(sum(new_sess) OVER (PARTITION BY user_id
             |           ORDER BY ts, event_id) AS BIGINT) AS session_id
             |  FROM l),
             |sess AS (SELECT user_id, session_id, count(*) AS n_events
             |         FROM s GROUP BY 1, 2),
             |h AS (SELECT n_events, count(*) AS n_sessions FROM sess GROUP BY 1),
             |t AS (SELECT CAST(sum(n_sessions) AS BIGINT) AS t FROM h)
             |SELECT n_events, n_sessions,
             |       floor(CAST(n_sessions AS DOUBLE) / CAST(t AS DOUBLE)
             |             * 1000000000.0 + 0.5) / 1000000000.0 AS share
             |FROM h CROSS JOIN t ORDER BY n_events""".stripMargin),
      doc = "session-depth histogram (bounce-vs-engaged distribution): " +
        "second rollup of f3's session table to |depths| rows, broadcast " +
        "total for shares"),

    Q("f8_last_touch",
      (s, d) => lastTouchAttribution(Tables.events(s, d)),
      Some("""WITH seg AS (
             |  SELECT user_id, event_type,
             |         CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS c,
             |         CAST(sum(CASE WHEN event_type <> 'purchase' THEN 1 ELSE 0 END)
             |           OVER (PARTITION BY user_id ORDER BY ts, event_id
             |                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS s
             |  FROM events),
             |touch AS (
             |  SELECT user_id, s, event_type AS touch_type
             |  FROM seg WHERE event_type <> 'purchase')
             |SELECT touch_type, count(*) AS n_purchases,
             |       CAST(sum(c) AS BIGINT) AS revenue_cents
             |FROM seg LEFT JOIN touch USING (user_id, s)
             |WHERE seg.event_type = 'purchase'
             |GROUP BY touch_type ORDER BY touch_type""".stripMargin),
      doc = "last-touch revenue attribution: running non-purchase count " +
        "segments each user's stream, purchases join the segment-opening " +
        "touch on the SAME user_id partitioning (no new shuffle), null " +
        "bucket preserves the revenue total"),

    Q("f9_stickiness",
      (s, d) => stickiness(Tables.events(s, d)),
      Some("""WITH du AS (
             |  SELECT DISTINCT CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day,
             |         user_id
             |  FROM events),
             |daily AS (
             |  SELECT day // 7 AS wk, CAST(sum(dau) AS BIGINT) AS sum_dau,
             |         count(*) AS n_days
             |  FROM (SELECT day, count(*) AS dau FROM du GROUP BY 1) dd
             |  GROUP BY 1),
             |weekly AS (
             |  SELECT wk, count(*) AS wau FROM
             |    (SELECT DISTINCT day // 7 AS wk, user_id FROM du) wu
             |  GROUP BY 1)
             |SELECT wk AS week, n_days, wau,
             |       floor(CAST(sum_dau AS DOUBLE) / CAST(n_days * wau AS DOUBLE)
             |             * 1000000000.0 + 0.5) / 1000000000.0 AS stickiness
             |FROM daily JOIN weekly USING (wk) ORDER BY week""".stripMargin),
      doc = "weekly stickiness (avg DAU / WAU): one distinct (day, user) " +
        "reduction feeds both rollups, integer epoch-day week indexing, " +
        "|weeks|-row join"),

    Q("f10_session_revenue",
      (s, d) => sessionRevenue(Tables.events(s, d), 21600L),
      Some(s"""WITH l AS (
              |  SELECT user_id, event_id, ts, event_type,
              |         CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS c,
              |         CASE WHEN lag(ts) OVER w IS NULL
              |              OR CAST(floor(epoch(ts)) AS BIGINT)
              |                 - CAST(floor(epoch(lag(ts) OVER w)) AS BIGINT) > 21600
              |              THEN 1 ELSE 0 END AS new_sess
              |  FROM events
              |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
              |s AS (
              |  SELECT user_id, event_type, c,
              |         CAST(sum(new_sess) OVER (PARTITION BY user_id
              |           ORDER BY ts, event_id) AS BIGINT) AS session_id
              |  FROM l),
              |sess AS (
              |  SELECT user_id, session_id,
              |         CAST(sum(CASE WHEN event_type = 'purchase' THEN c
              |                       ELSE 0 END) AS BIGINT) AS rev
              |  FROM s GROUP BY 1, 2),
              |base AS (
              |  SELECT count(*) AS n_sessions,
              |         CAST(sum(CASE WHEN rev > 0 THEN 1 ELSE 0 END) AS BIGINT)
              |           AS n_purchasing,
              |         CAST(sum(rev) AS BIGINT) AS revenue_cents
              |  FROM sess),
              |pb AS (SELECT rev, count(*) AS cnt FROM sess WHERE rev > 0 GROUP BY 1),
              |np AS (SELECT CAST(sum(cnt) AS BIGINT) AS np FROM pb),
              |cm AS (SELECT rev, sum(cnt) OVER (ORDER BY rev ROWS BETWEEN
              |         UNBOUNDED PRECEDING AND CURRENT ROW) AS cum FROM pb),
              |med AS (SELECT min(rev) AS p50_rev_cents FROM cm CROSS JOIN np
              |        WHERE cum >= (np + 1) // 2)
              |SELECT n_sessions, n_purchasing, revenue_cents,
              |       floor(CAST(n_purchasing AS DOUBLE) / CAST(n_sessions AS DOUBLE)
              |             * 1000000000.0 + 0.5) / 1000000000.0 AS purchase_share,
              |       floor(($meanRevExpr)
              |             * 1000000.0 + 0.5) / 1000000.0 AS mean_rev_cents,
              |       p50_rev_cents
              |FROM base CROSS JOIN med""".stripMargin),
      doc = "per-session revenue census: purchase cents collapse in f3's " +
        "one-shuffle session rollup; conversion share, exact revenue, " +
        "bin-convention lower median over |distinct cents| rows"),

    Q("f11_rfm_segments",
      (s, d) => rfmSegments(Tables.events(s, d)),
      Some("""WITH per AS (
             |  SELECT user_id, max(CAST(floor(epoch(ts)) AS BIGINT) // 86400) AS last_day,
             |         count(*) AS freq,
             |         CAST(sum(CASE WHEN event_type = 'purchase'
             |           THEN CAST(floor(value * 100.0 + 0.5) AS BIGINT)
             |           ELSE 0 END) AS BIGINT) AS mon
             |  FROM events GROUP BY user_id),
             |ref AS (SELECT max(last_day) AS ref_day, count(*) AS n_users FROM per),
             |m AS (SELECT user_id, n_users, ref_day - last_day AS recency, freq, mon
             |      FROM per CROSS JOIN ref),
             |q AS (
             |  SELECT user_id, freq, mon,
             |         (4 * rcum + n_users - 1) // n_users AS r_q,
             |         (4 * fcum + n_users - 1) // n_users AS f_q,
             |         (4 * mcum + n_users - 1) // n_users AS m_q
             |  FROM (
             |    SELECT user_id, n_users, freq, mon,
             |           CAST(count(*) OVER (ORDER BY recency RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS rcum,
             |           CAST(count(*) OVER (ORDER BY freq RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS fcum,
             |           CAST(count(*) OVER (ORDER BY mon RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS mcum
             |    FROM m))
             |SELECT r_q, f_q, m_q, count(*) AS n_users,
             |       CAST(sum(mon) AS BIGINT) AS revenue_cents,
             |       floor(avg(CAST(freq AS DOUBLE)) * 1000000.0 + 0.5) / 1000000.0
             |         AS avg_freq
             |FROM q GROUP BY r_q, f_q, m_q ORDER BY r_q, f_q, m_q""".stripMargin),
      doc = "RFM segment census: per-user recency/frequency/monetary, " +
        "quartiles assigned BY VALUE via integer ceil(4*cum/n) over the " +
        "|distinct values| cumulative table (never a |users| ntile), " +
        "segment rollup with exact revenue"),

    Q("f12_rolling_active",
      (s, d) => rollingActive(Tables.events(s, d)),
      Some("""WITH du AS (
             |  SELECT DISTINCT CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day,
             |         user_id
             |  FROM events),
             |dau AS (SELECT day, count(*) AS dau FROM du GROUP BY 1),
             |w AS (
             |  SELECT DISTINCT day + o AS day, user_id
             |  FROM du CROSS JOIN (SELECT unnest(range(0, 7)) AS o) oo),
             |wau AS (SELECT day, count(*) AS wau FROM w GROUP BY 1)
             |SELECT day, dau, wau,
             |       floor(CAST(dau AS DOUBLE) / CAST(wau AS DOUBLE)
             |             * 1000000.0 + 0.5) / 1000000.0 AS dau_wau_ratio
             |FROM dau JOIN wau USING (day) ORDER BY day""".stripMargin),
      doc = "rolling 7-day active users per day: each distinct (day, " +
        "user) activity fans out to the 7 days it covers (bounded 7x " +
        "widening, no per-day range re-scan), one distinct+count per " +
        "day; inner join drops past-stream-end windows"),

    Q("f13_funnel_by_variant",
      (s, d) => funnelByVariant(Tables.events(s, d)),
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
             |SELECT user_id % 2 AS variant, count(*) AS n_users,
             |       CAST(sum(CASE WHEN tv IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_view,
             |       CAST(sum(CASE WHEN tc IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_click_after_view,
             |       CAST(sum(CASE WHEN tp IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase_funnel,
             |       floor(CAST(sum(CASE WHEN tp IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
             |             / CAST(count(*) AS DOUBLE) * 1000000.0 + 0.5)
             |         / 1000000.0 AS conversion
             |FROM u GROUP BY 1 ORDER BY 1""".stripMargin),
      doc = "A/B-split sequential funnel (f2 x x31's hash variant): same " +
        "windowed conditional-min chain, one user_id shuffle, 2-row " +
        "variant rollup with conversion shares"),

    Q("f14_event_gaps",
      (s, d) => eventGapCensus(Tables.events(s, d)),
      Some(s"""WITH g0 AS (
              |  SELECT event_type,
              |         CAST(floor(epoch(ts)) AS BIGINT)
              |           - lag(CAST(floor(epoch(ts)) AS BIGINT))
              |             OVER (PARTITION BY user_id
              |                   ORDER BY CAST(floor(epoch(ts)) AS BIGINT),
              |                            event_id) AS g
              |  FROM events),
              |gg AS (SELECT event_type, g FROM g0 WHERE g IS NOT NULL),
              |mo AS (SELECT event_type,
              |              CAST(count(*) AS BIGINT) AS n_gaps,
              |              CAST(sum(CAST(g AS HUGEINT)) AS HUGEINT) AS sg,
              |              CAST(sum(CAST(g AS HUGEINT) * g) AS HUGEINT) AS sgg
              |       FROM gg GROUP BY 1)
              |SELECT event_type, n_gaps,
              |       floor(CAST(sg AS DOUBLE) / CAST(n_gaps AS DOUBLE)
              |             * 1000000.0 + 0.5) / 1000000.0 AS mean_gap_s,
              |       floor((CASE WHEN sg = 0 THEN NULL
              |               ELSE sqrt(CAST(CAST(n_gaps AS HUGEINT) * sgg - sg * sg
              |                              AS DOUBLE))
              |                    / CAST(sg AS DOUBLE) END)
              |             * 1000000.0 + 0.5) / 1000000.0 AS cv
              |FROM mo ORDER BY event_type""".stripMargin),
      doc = "inter-event gap census per type (traffic shape: CV << 1 " +
        "metronome, ~1 Poisson, >> 1 bursty): one user_id lag window, " +
        "exact decimal (n, sum, sum-of-squares) moments, shared CV tree, " +
        "|types| rows"),

    Q("f15_top_paths",
      (s, d) => topPaths(Tables.events(s, d)),
      Some("""WITH o AS (
             |  SELECT user_id, event_id, event_type,
             |         CAST(floor(epoch(ts)) AS BIGINT) AS sec
             |  FROM events),
             |lg AS (
             |  SELECT event_type,
             |         lag(event_type, 1) OVER (PARTITION BY user_id
             |           ORDER BY sec, event_id) AS p1,
             |         lag(event_type, 2) OVER (PARTITION BY user_id
             |           ORDER BY sec, event_id) AS p2
             |  FROM o)
             |SELECT p2 || '>' || p1 || '>' || event_type AS path,
             |       CAST(count(*) AS BIGINT) AS n
             |FROM lg WHERE p2 IS NOT NULL
             |GROUP BY 1 ORDER BY n DESC, path LIMIT 10""".stripMargin),
      doc = "top behavioral 3-paths (the memory check on f6's Markov " +
        "assumption): one user_id window shared by both lags, " +
        "map-side-combined path counts, top-10 TakeOrderedAndProject"),

    Q("f16_first_touch",
      (s, d) => firstTouchAttribution(Tables.events(s, d)),
      Some("""WITH b AS (
             |  SELECT user_id, event_id, event_type,
             |         CAST(floor(epoch(ts)) AS BIGINT) AS sec,
             |         CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS c
             |  FROM events),
             |ft AS (
             |  SELECT user_id, event_type AS touch_type FROM (
             |    SELECT user_id, event_type,
             |           row_number() OVER (PARTITION BY user_id
             |             ORDER BY sec, event_id) AS rn
             |    FROM b WHERE event_type <> 'purchase') x
             |  WHERE rn = 1)
             |SELECT ft.touch_type,
             |       CAST(count(*) AS BIGINT) AS n_purchases,
             |       CAST(sum(c) AS BIGINT) AS revenue_cents
             |FROM b LEFT JOIN ft ON ft.user_id = b.user_id
             |WHERE b.event_type = 'purchase'
             |GROUP BY 1 ORDER BY 1""".stripMargin),
      doc = "first-touch attribution (f8's acquisition-side " +
        "counterpart — the attribution dispute made queryable): NO " +
        "window, one combinable deterministic min_by per user, " +
        "user_id join, |channels| rows"),
  )
}
