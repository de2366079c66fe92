package graft

import java.sql.Timestamp

import operators.Funnel

class FunnelSpec extends SparkSpec {
  import spark.implicits._

  private def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")

  // (event_id, ts, user_id, event_type)
  private def ev(rows: (Long, Int, Long, String)*) =
    rows.map { case (e, m, u, t) => (e, ts(m), u, t) }
      .toDF("event_id", "ts", "user_id", "event_type")

  test("transitions count adjacent pairs per user, ordered by time") {
    val df = ev((1, 1, 1, "view"), (2, 2, 1, "click"), (3, 3, 1, "purchase"),
      (4, 1, 2, "view"), (5, 2, 2, "click"))
    val t = Funnel.eventTransitions(df).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(t == Map(("view", "click") -> 2L, ("click", "purchase") -> 1L))
  }

  test("funnel is strictly sequential: a purchase BEFORE the click does not convert") {
    val df = ev(
      // user 1: view -> click -> purchase (converts fully)
      (1, 1, 1, "view"), (2, 2, 1, "click"), (3, 3, 1, "purchase"),
      // user 2: purchase happens before the click — stage 3 must not count
      (4, 1, 2, "view"), (5, 3, 2, "click"), (6, 2, 2, "purchase"),
      // user 3: click with no prior view — stages 2 and 3 must not count
      (7, 1, 3, "click"), (8, 2, 3, "purchase"))
    val r = Funnel.funnelConversion(df).collect().head
    assert(r.getAs[Long]("n_users") == 3L)
    assert(r.getAs[Long]("n_view") == 2L)
    assert(r.getAs[Long]("n_click_after_view") == 2L)
    assert(r.getAs[Long]("n_purchase_funnel") == 1L)
  }

  test("retention cohorts: week-0 cell is the cohort size, later offsets shrink") {
    // minutes can't cross weeks — build timestamps directly
    def wts(day: Int) = Timestamp.valueOf(f"2024-01-${day}%02d 00:00:00")
    val df = Seq(
      // user 1 active in consecutive weeks starting Jan 1
      (1L, wts(1), 1L, "view"), (2L, wts(8), 1L, "view"),
      // user 2 active only in the first week (two events — distinct must dedup)
      (3L, wts(2), 2L, "view"), (4L, wts(3), 2L, "view"),
      // user 3 starts a week later
      (5L, wts(8), 3L, "view"))
      .toDF("event_id", "ts", "user_id", "event_type")
    val r = Funnel.retentionCohorts(df).collect()
      .map(x => (x.getAs[Long]("week_offset"), x.getAs[Long]("cohort_week")) ->
        (x.getAs[Long]("n_users"), x.getAs[Double]("retention"))).toMap
    val cohorts = r.keys.map(_._2).toSet
    assert(cohorts.size == 2, s"expected 2 cohorts, got $r")
    val first = cohorts.min
    assert(r((0L, first)) == (2L, 1.0))
    assert(r((1L, first)) == (1L, 0.5))
    assert(r((0L, cohorts.max)) == (1L, 1.0))
  }

  test("funnel stages are monotonically non-increasing on real data") {
    val r = Funnel.funnelConversion(Tables.events(spark, sf("sf0.01")))
      .collect().head
    val (u, v, c, p) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(u >= v && v >= c && c >= p, s"funnel not monotone: $u $v $c $p")
    assert(p > 0, "sf0.01 should have at least one full conversion")
  }

  test("time-to-convert: strictly-later purchase only; minute-binned lower median") {
    val df = ev(
      (1, 1, 1, "signup"), (2, 3, 1, "purchase"), // 120 s
      (3, 1, 2, "signup"), // never purchases
      (4, 6, 3, "signup"), (5, 5, 3, "purchase"), // purchase BEFORE signup
      (6, 1, 4, "signup"), (7, 2, 4, "purchase")) // 60 s
    val r = Funnel.timeToConvert(df).collect().head
    assert(r.getAs[Long]("n_from") == 4L)
    assert(r.getAs[Long]("n_converted") == 2L, "user 3 must not convert")
    assert(r.getAs[Double]("avg_delta_sec") == 90.0)
    // deltas {120 s, 60 s} -> minute bins {2, 1}; lower median = bin 1
    assert(r.getAs[Long]("p50_delta_min") == 1L)
  }

  test("markov matrix: rows normalize to 1 and probabilities match hand counts") {
    val df = ev(
      (1, 1, 1, "view"), (2, 2, 1, "click"), (3, 3, 1, "view"),
      (4, 4, 1, "click"), (5, 5, 1, "purchase"),
      (6, 1, 2, "view"), (7, 2, 2, "view"))
    val rows = Funnel.markovMatrix(df).collect()
    val p = rows.map(r => (r.getString(0), r.getString(1)) ->
      r.getAs[Double]("p_next")).toMap
    // from view: click twice, view once -> 2/3 and 1/3 (9-dp floor-rounded)
    assert(p(("view", "click")) == 0.666666667)
    assert(p(("view", "view")) == 0.333333333)
    assert(p(("click", "view")) == 0.5 && p(("click", "purchase")) == 0.5)
    rows.groupBy(_.getString(0)).foreach { case (prev, rs) =>
      val s = rs.map(_.getAs[Double]("p_next")).sum
      assert(math.abs(s - 1.0) < 1e-6, s"row $prev sums to $s")
    }
  }

  test("session depth histogram: counts sessions by depth, shares sum to 1") {
    // gap 60 s; user 1: minutes 1,2 then 30 (two sessions, depths 2 and 1);
    // user 2: minute 1 only (depth 1) -> histogram {1: 2, 2: 1}
    val df = ev((1, 1, 1, "view"), (2, 2, 1, "view"), (3, 30, 1, "view"),
      (4, 1, 2, "view"))
    val rows = Funnel.sessionDepthHistogram(df, 60L).collect()
    val m = rows.map(r => r.getAs[Long]("n_events") ->
      (r.getAs[Long]("n_sessions"), r.getAs[Double]("share"))).toMap
    assert(m(1L) == (2L, 0.666666667) && m(2L) == (1L, 0.333333333))
  }

  test("last touch: purchases credit the nearest preceding touch; no prior -> null") {
    import spark.implicits._
    val df = Seq(
      // user 1: view, purchase(2.00), click, purchase(3.00)
      (1L, ts(1), 1L, "view", 0.0), (2L, ts(2), 1L, "purchase", 2.0),
      (3L, ts(3), 1L, "click", 0.0), (4L, ts(4), 1L, "purchase", 3.0),
      // user 2: purchase with no prior event at all
      (5L, ts(1), 2L, "purchase", 5.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val rows = Funnel.lastTouchAttribution(df).collect()
    val m = rows.map(r => Option(r.getAs[String]("touch_type")) ->
      (r.getAs[Long]("n_purchases"), r.getAs[Long]("revenue_cents"))).toMap
    assert(m(Some("view")) == (1L, 200L))
    assert(m(Some("click")) == (1L, 300L))
    assert(m(None) == (1L, 500L), "orphan purchase must land in the null bucket")
    assert(rows.map(_.getAs[Long]("revenue_cents")).sum == 1000L,
      "attribution must conserve total purchase revenue")
  }

  test("stickiness: part-time users drag the avg-DAU/WAU ratio below 1") {
    import spark.implicits._
    def dts(day: Int) = java.sql.Timestamp.valueOf(f"1970-01-0${day + 1} 10:00:00")
    // week 0 (epoch days 0..6): user 1 active days 0 and 1; user 2 only day 0
    // dau: d0=2, d1=1 -> sum 3 over 2 active days; wau = 2 -> 3/(2*2) = 0.75
    val df = Seq((1L, dts(0)), (1L, dts(1)), (2L, dts(0)))
      .toDF("user_id", "ts")
    val r = Funnel.stickiness(df).collect().head
    assert(r.getAs[Long]("week") == 0L)
    assert(r.getAs[Long]("n_days") == 2L && r.getAs[Long]("wau") == 2L)
    assert(r.getAs[Double]("stickiness") == 0.75)
  }

  test("funnel by variant: per-variant stage counts and conversion share") {
    // u0 (v0): full funnel; u2 (v0): view+click; u1 (v1): view only
    val df = ev((1, 1, 0, "view"), (2, 2, 0, "click"), (3, 3, 0, "purchase"),
      (4, 1, 2, "view"), (5, 2, 2, "click"),
      (6, 1, 1, "view"))
    val m = Funnel.funnelByVariant(df).collect()
      .map(r => r.getAs[Long]("variant") ->
        (r.getAs[Long]("n_users"), r.getAs[Long]("n_view"),
          r.getAs[Long]("n_click_after_view"),
          r.getAs[Long]("n_purchase_funnel"),
          r.getAs[Double]("conversion"))).toMap
    assert(m(0L) == (2L, 2L, 2L, 1L, 0.5))
    assert(m(1L) == (1L, 1L, 0L, 0L, 0.0))
  }

  test("rfm: quartiles assigned by value (ties share), integer ceil(4*cum/n)") {
    import spark.implicits._
    def dts(day: Int) = Timestamp.valueOf(f"1970-01-0${day + 1} 10:00:00")
    // ref_day = 4, n = 4. Recencies: u1=4, u2=1, u3=0, u4=0 (tie).
    // cum over distinct asc: 0->2, 1->3, 4->4; q=(4*cum+3) div 4 -> 2/3/4.
    // freq 1..4 -> q 1..4; mon 0/100/200/300 -> q 1..4 by cum.
    val df = Seq(
      (1L, dts(0), 1L, "purchase", 1.0),
      (2L, dts(0), 2L, "view", 0.0), (3L, dts(3), 2L, "purchase", 2.0),
      (4L, dts(1), 3L, "view", 0.0), (5L, dts(2), 3L, "view", 0.0),
      (6L, dts(4), 3L, "view", 0.0),
      (7L, dts(1), 4L, "view", 0.0), (8L, dts(2), 4L, "view", 0.0),
      (9L, dts(3), 4L, "view", 0.0), (10L, dts(4), 4L, "purchase", 3.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val rows = Funnel.rfmSegments(df).collect()
    val segs = rows.map(r => (r.getAs[Long]("r_q"), r.getAs[Long]("f_q"),
      r.getAs[Long]("m_q")) -> r.getAs[Long]("revenue_cents")).toMap
    assert(segs == Map(
      (4L, 1L, 2L) -> 100L,  // u1: stale, one event, $1
      (3L, 2L, 3L) -> 200L,  // u2
      (2L, 3L, 1L) -> 0L,    // u3: fresh (tied recency 0), no purchases
      (2L, 4L, 4L) -> 300L)) // u4: shares recency quartile with u3
    assert(rows.map(_.getAs[Long]("n_users")).sum == 4L)
  }

  test("rolling active: activity covers 7 days; days without DAU drop") {
    import spark.implicits._
    def dts(day: Int) = Timestamp.valueOf(f"1970-01-${day + 1}%02d 10:00:00")
    // users 1,2 on day 0; user 3 on day 1; user 1 again on day 8
    val df = Seq((1L, dts(0)), (2L, dts(0)), (3L, dts(1)), (1L, dts(8)))
      .toDF("user_id", "ts")
    val got = Funnel.rollingActive(df).collect()
      .map(r => r.getAs[Long]("day") ->
        (r.getAs[Long]("dau"), r.getAs[Long]("wau"),
          r.getAs[Double]("dau_wau_ratio"))).toMap
    assert(got == Map(
      0L -> (2L, 2L, 1.0),        // window [-6,0]: only day-0 users
      1L -> (1L, 3L, 0.333333),   // day-0 pair still active in the window
      8L -> (1L, 1L, 1.0)))       // day-1 user aged out (8-6=2 > 1)
  }

  test("session revenue: purchases roll into their gap-session; median over purchasers") {
    import spark.implicits._
    // gap 60 s; user 1: session A (min 1-2: view + $2 purchase), session B
    // (min 30: $4 purchase); user 2: session C (view only)
    val df = Seq(
      (1L, ts(1), 1L, "view", 0.0), (2L, ts(2), 1L, "purchase", 2.0),
      (3L, ts(30), 1L, "purchase", 4.0),
      (4L, ts(1), 2L, "view", 0.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val r = Funnel.sessionRevenue(df, 60L).collect().head
    assert(r.getAs[Long]("n_sessions") == 3L)
    assert(r.getAs[Long]("n_purchasing") == 2L)
    assert(r.getAs[Long]("revenue_cents") == 600L)
    assert(r.getAs[Double]("mean_rev_cents") == 300.0)
    // purchasing sessions hold 200 and 400 cents -> lower median 200
    assert(r.getAs[Long]("p50_rev_cents") == 200L)
  }

  test("first touch credits the acquisition channel, not the closer") {
    import spark.implicits._
    import java.sql.Timestamp
    def ev(id: Long, u: Long, m: Int, t: String, v: Double) =
      (id, u, Timestamp.valueOf(f"2024-01-01 00:$m%02d:00"), t, v)
    // user 1: view -> click -> purchase(3.00): first touch = view
    //         (last touch would say click)
    // user 2: purchase with NO prior touch -> null channel
    val events = Seq(
      ev(1, 1, 1, "view", 0.0), ev(2, 1, 2, "click", 0.0),
      ev(3, 1, 3, "purchase", 3.0),
      ev(4, 2, 1, "purchase", 1.0))
      .toDF("event_id", "user_id", "ts", "event_type", "value")
    val rows = operators.Funnel.firstTouchAttribution(events).collect()
      .map(r => Option(r.getString(0)) ->
        (r.getLong(1), r.getLong(2))).toMap
    assert(rows(Some("view")) == ((1L, 300L)))
    assert(rows(None) == ((1L, 100L)), "touchless purchases keep a null row")
    assert(!rows.contains(Some("click")))
  }

  test("top paths: trigram counts across users, tie-broken lexically") {
    import spark.implicits._
    import java.sql.Timestamp
    def ev(id: Long, u: Long, m: Int, t: String) =
      (id, u, Timestamp.valueOf(f"2024-01-01 00:$m%02d:00"), t)
    val events = Seq(
      ev(1, 1, 1, "a"), ev(2, 1, 2, "b"), ev(3, 1, 3, "c"), ev(4, 1, 4, "d"),
      ev(5, 2, 1, "a"), ev(6, 2, 2, "b"), ev(7, 2, 3, "c"))
      .toDF("event_id", "user_id", "ts", "event_type")
    val rows = operators.Funnel.topPaths(events).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toSeq
    assert(rows == Seq("a>b>c" -> 2L, "b>c>d" -> 1L))
  }

  test("event gap census: metronome CV is zero, irregular gaps raise it") {
    import spark.implicits._
    import java.sql.Timestamp
    def ev(id: Long, u: Long, sec: Int, t: String) =
      (id, u, Timestamp.valueOf(f"2024-01-01 00:${sec / 60}%02d:${sec % 60}%02d"), t)
    val events = Seq(
      ev(1, 1, 0, "a"), ev(2, 1, 10, "b"), ev(3, 1, 20, "b"), // gaps 10, 10
      ev(4, 2, 0, "a"), ev(5, 2, 5, "c"), ev(6, 2, 20, "c"))  // gaps 5, 15
      .toDF("event_id", "user_id", "ts", "event_type")
    val m = operators.Funnel.eventGapCensus(events).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    // first events per user have no gap -> type a absent
    assert(!m.contains("a"))
    assert(m("b") == ((2L, 10.0, 0.0)), "constant gaps -> CV 0")
    // type c: gaps 5,15 -> mean 10, sqrt(2*250-400)/20 = 0.5
    assert(m("c") == ((2L, 10.0, 0.5)))
  }
}
