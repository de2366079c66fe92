package graft

import org.apache.spark.sql.functions._

import operators.Stats

class StatsSpec extends SparkSpec {

  test("hll estimate is within the theoretical error band of the exact count") {
    val r = Stats.hllDistinctWords(Tables.documents(spark, sf("sf0.01"))).collect().head
    val exact = r.getAs[Long]("exact_distinct").toDouble
    val est = r.getAs[Double]("hll_estimate")
    // standard error for m=64 is 1.04/sqrt(64) = 13%; allow 3 sigma
    assert(math.abs(est - exact) / exact < 0.39,
      s"estimate $est too far from exact $exact")
    assert(r.getAs[Long]("nonzero_registers") <= 64L)
  }

  test("per-group hll: groups are independent and estimates track exact counts") {
    import spark.implicits._
    // group a: 10 distinct values, group b: 200 distinct — both well under
    // the linear-counting regime, where the estimator is tight
    val df = ((1 to 10).map(i => ("a", i)) ++ (1 to 200).map(i => ("b", i + 1000)))
      .toDF("g", "v")
    val rows = Stats.hllDistinctPerGroup(df, "g", "v").collect()
      .map(r => r.getAs[String]("g") ->
        (r.getAs[Long]("exact_distinct"), r.getAs[Double]("hll_estimate"))).toMap
    assert(rows("a")._1 == 10L && rows("b")._1 == 200L)
    rows.foreach { case (g, (exact, est)) =>
      assert(math.abs(est - exact) / exact < 0.39,
        s"group $g estimate $est too far from exact $exact")
    }
  }

  test("per-group hll: duplicate values do not move a group's sketch") {
    import spark.implicits._
    val once = (1 to 50).map(i => ("g", i)).toDF("g", "v")
    val tripled = (1 to 3).flatMap(_ => (1 to 50).map(i => ("g", i))).toDF("g", "v")
    val e1 = Stats.hllDistinctPerGroup(once, "g", "v")
      .collect().head.getAs[Double]("hll_estimate")
    val e3 = Stats.hllDistinctPerGroup(tripled, "g", "v")
      .collect().head.getAs[Double]("hll_estimate")
    assert(e1 == e3, "sketch must depend only on the distinct value set")
  }

  test("corrExact is exactly 1 on a perfectly linear column pair") {
    import spark.implicits._
    val df = (1L to 100L).map(i => (i, 3 * i + 7)).toDF("x", "y")
    val r = Stats.corrExact(df, "x", "y").collect().head
    assert(r.getAs[Double]("corr") == 1.0)
    assert(r.getAs[Long]("n_rows") == 100L)
  }

  test("zorder key is a bijection on the 8-bit x 8-bit grid") {
    import spark.implicits._
    val grid = spark.range(256 * 256)
      .select((col("id") % 256).as("x"), expr("id div 256").as("y"))
    val keys = grid.select(expr(Stats.zorderKeyExpr("x", "y")).as("z"))
    assert(keys.distinct().count() == 256L * 256L, "interleave must not collide")
    assert(keys.agg(max("z")).collect().head.getLong(0) == 65535L)
  }

  test("welch t: zero for identical groups, matches hand value, dof in [min(n)-1, n1+n2-2]") {
    import spark.implicits._
    // groups a/b identical distributions -> t = 0; c is shifted
    val rows = (1L to 10L).flatMap(i => Seq(("a", i), ("b", i), ("c", i + 100)))
    val r = Stats.welchTPairwise(rows.toDF("g", "x"), "g", "x").collect()
      .map(x => (x.getString(0), x.getString(1)) ->
        (x.getAs[Double]("t_stat"), x.getAs[Double]("dof"))).toMap
    assert(r(("a", "b"))._1 == 0.0)
    // equal n and equal variance: Welch dof reduces to n1+n2-2 = 18
    assert(r(("a", "b"))._2 == 18.0)
    // a vs c: same spread, mean gap 100 -> t = -100 / sqrt(2*v/10),
    // v = sample var of 1..10 = 55/6
    val expectedT = -100.0 / math.sqrt(2.0 * (55.0 / 6.0) / 10.0)
    assert(math.abs(r(("a", "c"))._1 - expectedT) < 1e-4,
      s"t=${r(("a", "c"))._1} expected $expectedT")
    r.values.foreach { case (_, dof) => assert(dof >= 9.0 && dof <= 18.0) }
  }

  test("gini: 0 for equal shares, (n-1)/n when one user holds everything") {
    import spark.implicits._
    def ev(rows: (Long, Double)*) =
      rows.zipWithIndex.map { case ((u, v), i) => (i.toLong, u, v) }
        .toDF("event_id", "user_id", "value")
    val equal = Stats.giniUserValue(
      ev((1L, 100.0), (2L, 100.0), (3L, 100.0), (4L, 100.0))).collect().head
    assert(equal.getAs[Double]("gini") == 0.0)
    assert(equal.getAs[Long]("n_users") == 4L)
    // 4 users, one holds all value (others hold ~0 via sub-unit totals):
    // G = (n-1)/n = 0.75
    val skewed = Stats.giniUserValue(
      ev((1L, 400.0), (2L, 0.0), (3L, 0.0), (4L, 0.0))).collect().head
    assert(skewed.getAs[Double]("gini") == 0.75)
  }

  test("hll set algebra: exact overlaps right, union dominates singles, estimates in band") {
    import spark.implicits._
    // groups: a = users 1..60, b = users 41..100 (overlap 20), c = disjoint 200..220
    val rows = (1L to 60L).map(("a", _)) ++ (41L to 100L).map(("b", _)) ++
      (200L to 220L).map(("c", _))
    val df = rows.zipWithIndex
      .map { case ((g, u), i) => (i.toLong, g, u) }
      .toDF("event_id", "event_type", "user_id")
    val r = Stats.hllSetAlgebra(df, "event_type", "user_id").collect()
      .map(x => (x.getString(0), x.getString(1)) -> x).toMap
    val ab = r(("a", "b"))
    assert(ab.getAs[Long]("exact_a") == 60L && ab.getAs[Long]("exact_b") == 60L)
    assert(ab.getAs[Long]("exact_inter") == 20L)
    assert(r(("a", "c")).getAs[Long]("exact_inter") == 0L)
    r.values.foreach { row =>
      val (ea, eb) = (row.getAs[Long]("exact_a"), row.getAs[Long]("exact_b"))
      val (ha, hb, hu) = (row.getAs[Double]("hll_a"),
        row.getAs[Double]("hll_b"), row.getAs[Double]("hll_union"))
      // max-merged registers can only estimate >= either side
      assert(hu >= math.max(ha, hb) - 1e-9, "union must dominate singles")
      // 64 registers: σ ≈ 1.04/8 = 13% — allow 3σ
      assert(math.abs(ha - ea) <= 0.4 * ea, s"hll_a=$ha exact=$ea")
      assert(math.abs(hb - eb) <= 0.4 * eb, s"hll_b=$hb exact=$eb")
    }
  }

  test("cuped: perfectly pre-correlated metric collapses to zero variance, theta exact") {
    import spark.implicits._
    import java.sql.Timestamp
    // user i: pre value = i, post value = 2i (y = 2x exactly) ->
    // theta = 2 and every adjusted value equals 2*mean(x): var_adj = 0
    val pre = Timestamp.valueOf("2024-01-10 00:00:00")
    val post = Timestamp.valueOf("2024-01-20 00:00:00")
    val rows = (1L to 20L).flatMap(i =>
      Seq((i, pre, i.toDouble), (i, post, 2.0 * i)))
    val df = rows.zipWithIndex
      .map { case ((u, t, v), j) => (j.toLong, t, u, v) }
      .toDF("event_id", "ts", "user_id", "value")
    val r = Stats.cupedByVariant(df).collect()
    assert(r.length == 2)
    r.foreach { row =>
      assert(row.getAs[Double]("theta") == 2.0)
      assert(row.getAs[Double]("var_adj") == 0.0,
        s"variant ${row.get(0)}: var_adj ${row.getAs[Double]("var_adj")}")
      assert(row.getAs[Double]("var_raw") > 0.0)
      // adjusted mean = 2 * global mean(x) = 2 * mean(1..20) = 21
      assert(row.getAs[Double]("mean_adj") == 21.0)
    }
  }

  test("mann-whitney: hand value with a tie (a={1,2}, b={2,3} cents)") {
    import spark.implicits._
    val df = Seq(("click", 0.01), ("click", 0.02),
      ("purchase", 0.02), ("purchase", 0.03)).toDF("event_type", "value")
    val r = Stats.mannWhitneyU(df).collect().head
    assert(r.getAs[Long]("n_a") == 2L && r.getAs[Long]("n_b") == 2L)
    // ranks: 1, {2.5, 2.5} tie, 4 -> R_a = 3.5, U_a = 3.5 - 3 = 0.5
    assert(r.getAs[Double]("u_a") == 0.5)
    // z = (0.5 - 2) / sqrt(1/3 * (5 - 6/12)) = -1.5/sqrt(1.5)
    assert(math.abs(r.getAs[Double]("z") - -1.224745) < 1e-9)
  }

  test("mann-whitney: identical distributions give u_a = n_a*n_b/2 and z = 0") {
    import spark.implicits._
    val df = (1 to 10).flatMap(i =>
      Seq(("click", i / 100.0), ("purchase", i / 100.0)))
      .toDF("event_type", "value")
    val r = Stats.mannWhitneyU(df).collect().head
    assert(r.getAs[Double]("u_a") == 50.0)
    assert(r.getAs[Double]("z") == 0.0)
  }

  test("ols: perfect line gives exact slope/intercept/r2; hand moments for a non-fit") {
    import spark.implicits._
    val df = Seq(("A", 1.0, 2.00), ("A", 2.0, 4.00), ("A", 3.0, 6.00),
      ("R", 1.0, 1.00), ("R", 2.0, 2.00), ("R", 3.0, 4.00))
      .toDF("l_returnflag", "l_quantity", "l_extendedprice")
    val m = Stats.olsPriceOnQty(df).collect()
      .map(r => r.getAs[String]("flag") -> r).toMap
    assert(m("A").getAs[Double]("slope_cents_per_unit") == 200.0)
    assert(m("A").getAs[Double]("intercept_cents") == 0.0)
    assert(m("A").getAs[Double]("r2") == 1.0)
    // R: num = 3*1700-6*700 = 900, den = 6 -> slope 150; r2 = 900^2/(6*140000)
    assert(m("R").getAs[Double]("slope_cents_per_unit") == 150.0)
    assert(math.abs(m("R").getAs[Double]("intercept_cents") - -66.6667) < 1e-9)
    assert(math.abs(m("R").getAs[Double]("r2") - 810000.0 / 840000.0) < 1e-6)
  }

  test("daily autocorr: +1 on a doubling series; a gap day pairs only adjacents") {
    import spark.implicits._
    def d(day: Int) = java.sql.Timestamp.valueOf(f"2024-01-${day}%02d 12:00:00")
    val perfect = Seq((d(1), 1.00), (d(2), 2.00), (d(3), 4.00)).toDF("ts", "value")
    val r = Stats.dailyRevenueAutocorr(perfect).collect().head
    assert(r.getAs[Long]("n_pairs") == 2L)
    assert(r.getAs[Double]("autocorr_lag1") == 1.0)
    val gapped = Seq((d(1), 1.00), (d(2), 2.00), (d(4), 4.00)).toDF("ts", "value")
    val g = Stats.dailyRevenueAutocorr(gapped).collect().head
    assert(g.getAs[Long]("n_pairs") == 1L, "day 2 -> day 4 must NOT pair")
    assert(g.isNullAt(g.fieldIndex("autocorr_lag1")),
      "one pair has no defined correlation — null, not a crash")
  }

  test("prop z-test: hand value, and sign flips with the better variant") {
    import spark.implicits._
    // variant 0 (even users): 1 of 2 convert; variant 1: 2 of 2 convert
    val df = Seq((0L, "purchase"), (0L, "view"), (2L, "view"),
      (1L, "purchase"), (3L, "purchase"))
      .toDF("user_id", "event_type")
    val r = Stats.propZTest(df).collect().head
    assert(r.getAs[Long]("n_a") == 2L && r.getAs[Long]("k_a") == 1L)
    assert(r.getAs[Long]("n_b") == 2L && r.getAs[Long]("k_b") == 2L)
    assert(r.getAs[Double]("p_a") == 0.5 && r.getAs[Double]("p_b") == 1.0)
    // pooled p = 3/4; z = -0.5 / sqrt(0.1875 * 1) = -1.154701
    assert(math.abs(r.getAs[Double]("z") - -1.154701) < 1e-9)
  }

  test("prop z-test: all-converted pool has zero variance -> null z") {
    import spark.implicits._
    val df = Seq((0L, "purchase"), (1L, "purchase")).toDF("user_id", "event_type")
    val r = Stats.propZTest(df).collect().head
    assert(r.isNullAt(r.fieldIndex("z")))
  }

  test("dow seasonality: 7 buckets max, shares sum to ~1, epoch day 0 is Sunday+4") {
    import spark.implicits._
    // 1970-01-01 (epoch day 0) is a Thursday -> (0+4)%7 = 4
    val df = Seq(
      (java.sql.Timestamp.valueOf("1970-01-01 06:00:00"), 1.00),
      (java.sql.Timestamp.valueOf("1970-01-02 06:00:00"), 3.00))
      .toDF("ts", "value")
    val rows = Stats.dowSeasonality(df).collect()
    val m = rows.map(r => r.getAs[Long]("dow") ->
      (r.getAs[Long]("revenue_cents"), r.getAs[Double]("revenue_share"))).toMap
    assert(m(4L) == (100L, 0.25) && m(5L) == (300L, 0.75))
    val real = Stats.dowSeasonality(Tables.events(spark, sf("sf0.01"))).collect()
    assert(real.length <= 7)
    assert(math.abs(real.map(_.getAs[Double]("revenue_share")).sum - 1.0) < 1e-6)
  }

  test("winsorized mean: clamps the outlier, bounds pinned at ceil(p*n)") {
    import spark.implicits._
    // 20 values: 1..19 cents plus one 10000-cent outlier
    val df = ((1 to 19).map(i => ("click", i / 100.0)) :+ (("click", 100.0)))
      .toDF("event_type", "value")
    val r = Stats.winsorizedMean(df).collect().head
    // n=20: lo = v at cum>=1 -> 1; hi = v at cum>=19 -> 19 (outlier clamped)
    assert(r.getAs[Long]("n") == 20L)
    assert(r.getAs[Long]("lo_cents") == 1L && r.getAs[Long]("hi_cents") == 19L)
    // winsorized sum = (1+...+19) + 19 = 209 cents -> mean 0.1045
    assert(r.getAs[Double]("winsorized_mean") == 0.1045)
  }

  test("winsorized mean equals the plain mean when nothing crosses the bounds") {
    import spark.implicits._
    // all mass on one value: lo = hi = v, clamp is the identity
    val df = (1 to 10).map(_ => ("view", 2.00)).toDF("event_type", "value")
    val r = Stats.winsorizedMean(df).collect().head
    assert(r.getAs[Double]("winsorized_mean") == 2.0)
  }

  test("daily percentiles: hand-pinned medians per day, p50 <= p95") {
    import spark.implicits._
    def t(day: Int, h: Int) = java.sql.Timestamp.valueOf(f"2024-01-${day}%02d $h%02d:00:00")
    // day 1: {1,2,3} cents -> p50=2 p95=3; day 2: {5,5,7,9} -> p50=5 p95=9
    val df = Seq((t(1, 1), 0.01), (t(1, 2), 0.02), (t(1, 3), 0.03),
      (t(2, 1), 0.05), (t(2, 2), 0.05), (t(2, 3), 0.07), (t(2, 4), 0.09))
      .toDF("ts", "value")
    val m = Stats.dailyPercentiles(df).collect()
      .map(r => r.getAs[Long]("n") ->
        (r.getAs[Long]("p50_cents"), r.getAs[Long]("p95_cents"))).toMap
    assert(m(3L) == (2L, 3L))
    assert(m(4L) == (5L, 9L))
    val real = Stats.dailyPercentiles(Tables.events(spark, sf("sf0.01"))).collect()
    assert(real.forall(r => r.getAs[Long]("p50_cents") <= r.getAs[Long]("p95_cents")))
  }

  test("benford: nine rows always, hand shares, expectations sum to ~1") {
    import spark.implicits._
    // cents 100,123,19,2,2000,9 -> digits 1,1,1,2,2,9
    val df = Seq(1.00, 1.23, 0.19, 0.02, 20.00, 0.09).map(("click", _))
      .toDF("event_type", "value")
    val rows = Stats.benfordDigits(df).collect()
    assert(rows.length == 9, "all nine digits present even with zero counts")
    val m = rows.map(r => r.getAs[Long]("digit") ->
      (r.getAs[Long]("n"), r.getAs[Double]("share"))).toMap
    assert(m(1L) == (3L, 0.5) && m(2L) == (2L, (2.0 / 6 * 1e9).round / 1e9)
      && m(9L)._1 == 1L && m(5L) == (0L, 0.0))
    val exp = rows.map(_.getAs[Double]("benford_expected")).sum
    assert(math.abs(exp - 1.0) < 1e-6)
  }

  test("mad: one wild outlier cannot move the median or the MAD") {
    import spark.implicits._
    val base = (1 to 9).map(i => ("click", i / 100.0))
    val clean = Stats.madValue(base.toDF("event_type", "value")).collect().head
    val dirty = Stats.madValue((base :+ (("click", 10000.0)))
      .toDF("event_type", "value")).collect().head
    // {1..9}: median 5, deviations {0..4} twice -> MAD = 2
    assert(clean.getAs[Long]("median_cents") == 5L)
    assert(clean.getAs[Long]("mad_cents") == 2L)
    assert(dirty.getAs[Long]("median_cents") == 5L, "median robust to the outlier")
    assert(dirty.getAs[Long]("mad_cents") <= 3L, "MAD robust to the outlier")
  }

  test("zorder buckets bound both dimensions (the data-skipping property)") {
    val stats = Stats.zorderClustering(Tables.events(spark, sf("sf0.01"))).collect()
    stats.foreach { r =>
      val xs = r.getAs[Long]("x_max") - r.getAs[Long]("x_min")
      val ys = r.getAs[Long]("y_max") - r.getAs[Long]("y_min")
      // a 1024-wide z-range spans at most 2^5 values of each 8-bit dim
      // (5 of the 10 interleaved low bits belong to each dimension)
      assert(xs <= 63 && ys <= 63,
        s"bucket ${r.getAs[Long]("bucket")} spans x=$xs y=$ys — not clustered")
    }
  }

  test("spearman: monotone is 1, anti-monotone is -1, ties keep |rho| <= 1") {
    import spark.implicits._
    def li(rows: (Double, Double)*) =
      rows.toDF("l_quantity", "l_extendedprice")
    val up = Stats.spearmanQtyPrice(li((1.0, 10.0), (2.0, 20.0), (3.0, 305.0)))
      .collect().head
    assert(up.getAs[Long]("n_rows") == 3L)
    assert(up.getAs[Double]("spearman_rho") == 1.0,
      "any monotone map must give rho = 1 (rank-based, scale-free)")
    val down = Stats.spearmanQtyPrice(li((1.0, 30.0), (2.0, 20.0), (3.0, 10.0)))
      .collect().head
    assert(down.getAs[Double]("spearman_rho") == -1.0)
    // heavy ties on x: {1,1,2,2} vs y strictly increasing — average-rank
    // ties shrink the correlation below 1 but keep it positive
    val tied = Stats.spearmanQtyPrice(
      li((1.0, 1.0), (1.0, 2.0), (2.0, 3.0), (2.0, 4.0))).collect().head
    val rho = tied.getAs[Double]("spearman_rho")
    assert(rho > 0.0 && rho < 1.0, s"tie-damped rho out of range: $rho")
  }

  test("cusum changepoint lands on the last day of the first regime") {
    import spark.implicits._
    import java.sql.Timestamp
    // daily revenue 10,10,10,20,20 dollars: D_k = n*S_k - k*T peaks (in
    // magnitude) at k=3 with |D|=6000 cents -> stat 6000/5 = 1200
    val df = (1 to 5).map(i =>
        (Timestamp.valueOf(f"2024-01-0$i 12:00:00"), if (i <= 3) 10.0 else 20.0))
      .toDF("ts", "value")
    val r = Stats.cusumChangepoint(df).collect().head
    assert(r.getAs[Long]("n_days") == 5L)
    val cp = r.getAs[Long]("cp_day")
    val d3 = Timestamp.valueOf("2024-01-03 12:00:00").getTime / 86400000L
    assert(cp == d3, s"changepoint day $cp != expected epoch day $d3")
    assert(r.getAs[Double]("cusum_max_cents") == 1200.0)
  }

  test("cramers v: perfect association is 1, independence is ~0, 1xk grid is null") {
    import spark.implicits._
    def docs(rows: (String, String)*) =
      rows.zipWithIndex.map { case ((l, s), i) => (i.toLong, l, s) }
        .toDF("doc_id", "lang", "source")
    // perfectly diagonal 2x2: lang determines source
    val perfect = docs(("en", "a"), ("en", "a"), ("de", "b"), ("de", "b"))
    assert(Stats.cramersV(perfect).collect().head.getAs[Double]("cramers_v") == 1.0)
    // exactly independent 2x2 (all cells equal)
    val indep = docs(("en", "a"), ("en", "b"), ("de", "a"), ("de", "b"))
    assert(Stats.cramersV(indep).collect().head.getAs[Double]("cramers_v") == 0.0)
    // single lang: min(r-1, c-1) = 0 -> undefined
    val flat = docs(("en", "a"), ("en", "b"))
    assert(Stats.cramersV(flat).collect().head.isNullAt(2))
  }

  test("lorenz deciles: uniform users give the diagonal, concentration bends it") {
    import spark.implicits._
    import java.sql.Timestamp
    val ts = Timestamp.valueOf("2024-01-01 00:00:00")
    // 10 users, one event of value 1.0 each -> share(d) = d/10 exactly
    val uni = (1 to 10).map(u => (u.toLong, ts, 1.0)).toDF("user_id", "ts", "value")
    val us = Stats.lorenzDeciles(uni).collect()
      .map(r => r.getAs[Long]("decile") -> r.getAs[Double]("rev_share")).toMap
    (1 to 10).foreach(d => assert(us(d.toLong) == d / 10.0, s"decile $d: ${us(d.toLong)}"))
    // one whale: bottom deciles hold almost nothing, decile 10 holds all
    val whale = ((1 to 9).map(u => (u.toLong, ts, 1.0)) :+ ((10L, ts, 991.0)))
      .toDF("user_id", "ts", "value")
    val ws = Stats.lorenzDeciles(whale).collect()
      .map(r => r.getAs[Long]("decile") -> r.getAs[Double]("rev_share")).toMap
    assert(ws(9L) == 0.009 && ws(10L) == 1.0)
  }

  test("tukey fences: a single wild value is the only outlier counted") {
    import spark.implicits._
    // values 1..8 dollars plus one 100-dollar spike, all one type
    val df = ((1 to 8).map(i => ("click", i.toDouble)) :+ (("click", 100.0)))
      .toDF("event_type", "value")
    val r = Stats.tukeyOutliers(df).collect().head
    // n=9: q1 = v at ceil(9/4)=rank 3 -> 300; q3 = rank ceil(27/4)=7 -> 700
    assert(r.getAs[Long]("q1_cents") == 300L)
    assert(r.getAs[Long]("q3_cents") == 700L)
    // fences: 300 - 600 = -300, 700 + 600 = 1300 -> only the 10000 spike
    assert(r.getAs[Long]("n_low") == 0L && r.getAs[Long]("n_high") == 1L)
    assert(r.getAs[Double]("outlier_share") == 0.111111111)
  }

  test("theil-sen: lower median of pairwise slopes in micro-units") {
    import spark.implicits._
    import java.sql.Timestamp
    // days 0,1,3 with revenue 100/200/500 cents -> slopes (micro):
    // (0,1): 100e6; (0,3): floor(400/3*1e6)=133333333; (1,3): 150e6.
    // n_pairs=3, threshold (3+1)/2=2 -> lower median 133333333.
    val df = Seq((1L, 1.00), (2L, 2.00), (4L, 5.00)).map { case (d, p) =>
      (Timestamp.valueOf(f"1970-01-0$d 00:00:00"), p)
    }.toDF("o_orderdate", "o_totalprice")
    val r = Stats.theilSen(df).collect().head
    assert(r.getAs[Long]("n_days") == 3L)
    assert(r.getAs[Long]("n_pairs") == 3L)
    assert(r.getAs[Long]("slope_micro_p50") == 133333333L)
  }

  test("theil-sen two-level median equals the brute-force lower median " +
    "(r19: degenerate single bucket + mixed-sign multi-bucket)") {
    import spark.implicits._
    import java.sql.Timestamp
    def run(cents: Seq[Long]): (Long, Long) = {
      val df = cents.zipWithIndex.map { case (c, i) =>
        (new Timestamp((i.toLong + 1) * 86400000L), c / 100.0)
      }.toDF("o_orderdate", "o_totalprice")
      val r = Stats.theilSen(df).collect().head
      (r.getAs[Long]("n_pairs"), r.getAs[Long]("slope_micro_p50"))
    }
    def brute(cents: Seq[Long]): (Long, Long) = {
      val days = cents.indices.map(_.toLong)
      val slopes = for {
        i <- cents.indices; j <- cents.indices if i < j
      } yield math.floor(
        (cents(j) - cents(i)).toDouble / (days(j) - days(i)) * 1e6).toLong
      val sorted = slopes.sorted
      (slopes.size.toLong, sorted(((slopes.size + 1) / 2 - 1).toInt))
    }
    // degenerate: perfectly linear series -> every slope identical, the
    // whole grid lands in ONE bucket (mx == mn -> width 1, bucket 0)
    val lin = (1L to 12L).map(_ * 250L)
    assert(run(lin) == brute(lin))
    // mixed-sign slopes spread over many buckets, even pair count, ties
    val mixed = Seq(1000L, 40L, 980L, 40L, 2500L, 10L, 10L, 1990L, 770L,
      33L, 33L, 5000L, 120L)
    assert(run(mixed) == brute(mixed))
  }

  test("jarque-bera: symmetric group skew 0 / kurtosis 1.5; constant group null") {
    import spark.implicits._
    // A: 1,2,3 -> m2=2/3, m3=0, m4=2/3 -> g1=0, g2=1.5,
    // JB = 3/6*(0 + (1.5-3)^2/4) = 0.28125 -> pround4 0.2813
    val df = Seq(("A", 1.0), ("A", 2.0), ("A", 3.0), ("B", 5.0), ("B", 5.0))
      .toDF("l_returnflag", "l_quantity")
    val m = Stats.jarqueBera(df).collect()
      .map(r => r.getAs[String]("l_returnflag") -> r).toMap
    assert(m("A").getAs[Double]("skewness") == 0.0)
    assert(m("A").getAs[Double]("kurtosis") == 1.5)
    assert(m("A").getAs[Double]("jb_stat") == 0.2813)
    assert(m("B").isNullAt(2) && m("B").isNullAt(3) && m("B").isNullAt(4))
  }

  test("ewma: exact 8^k*10^(14-k) weights, true day-distance decay over gaps") {
    import spark.implicits._
    import java.sql.Timestamp
    // days 0,1,3 (gap!) revenue 100/200/400 cents
    val df = Seq((1L, 1.00), (2L, 2.00), (4L, 4.00)).map { case (d, p) =>
      (Timestamp.valueOf(f"1970-01-0$d 00:00:00"), p)
    }.toDF("o_orderdate", "o_totalprice")
    def w(k: Int): Double = math.pow(8.0, k) * math.pow(10.0, 14 - k)
    def exp(terms: (Int, Long)*): Double = {
      val num = terms.map { case (k, r) => BigDecimal(w(k)) * BigDecimal(r) }.sum
      val den = terms.map { case (k, _) => BigDecimal(w(k)) }.sum
      math.floor((num / den).toDouble * 1e6 + 0.5) / 1e6
    }
    val got = Stats.ewmaRevenue(df).collect()
      .map(r => r.getAs[Long]("day") -> r.getAs[Double]("ewma_cents")).toMap
    assert(got(0L) == 100.0)
    assert(got(1L) == exp(0 -> 200L, 1 -> 100L))
    // day 3 decays day 1 by distance 2 and day 0 by distance 3 — row
    // offsets would weight them 1 and 2
    assert(got(3L) == exp(0 -> 400L, 2 -> 200L, 3 -> 100L))
  }

  test("sign test: per-user signs, ties dropped, z = (pos-neg)/sqrt(pos+neg)") {
    import spark.implicits._
    import java.sql.Timestamp
    val t0 = Timestamp.valueOf("2024-01-01 00:00:00")
    // u1: 2v/1c (+), u2: 1v/2c (-), u3: 1v/1c (tie), u4: 3v/0c (+)
    val rows = Seq(
      (1L, "view"), (1L, "view"), (1L, "click"),
      (2L, "view"), (2L, "click"), (2L, "click"),
      (3L, "view"), (3L, "click"),
      (4L, "view"), (4L, "view"), (4L, "view"),
      (4L, "purchase")) // other types ignored
      .zipWithIndex.map { case ((u, t), i) => (i.toLong, t0, u, t, 0.0) }
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val r = Stats.signTest(rows).collect().head
    assert(r.getAs[Long]("n_pos") == 2L)
    assert(r.getAs[Long]("n_neg") == 1L)
    assert(r.getAs[Long]("n_ties") == 1L)
    assert(r.getAs[Double]("z") ==
      math.floor(1.0 / math.sqrt(3.0) * 1e6 + 0.5) / 1e6)
  }

  test("acf ladder: alternating series gives -1 at odd lags, +1 at even") {
    import spark.implicits._
    import java.sql.Timestamp
    // one event per day, value alternating 1.00 / 2.00 over days 0..9
    val df = (0 until 10).map { day =>
      (day.toLong, Timestamp.valueOf(f"1970-01-${day + 1}%02d 00:00:00"),
        1L, "view", if (day % 2 == 0) 1.0 else 2.0)
    }.toDF("event_id", "ts", "user_id", "event_type", "value")
    val m = Stats.acfLadder(df).collect()
      .map(r => r.getAs[Long]("lag") ->
        (r.getAs[Long]("n_pairs"), r.getAs[Double]("acf"))).toMap
    assert(m(1L) == (9L, -1.0))
    assert(m(2L) == (8L, 1.0))
    assert(m(7L) == (3L, -1.0))
  }

  test("hill tail: alpha from micro-nat log ratios; tie-robust at the cut") {
    import spark.implicits._
    // lengths 8,4,2,2 with k=4 -> x_k=2; ln ratios 4x/2x/1/1
    val df = Seq((0L, "t", "en", "s", 8L), (1L, "t", "en", "s", 4L),
      (2L, "t", "en", "s", 2L), (3L, "t", "en", "s", 2L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val s = math.floor(math.log(4.0) * 1e6).toLong +
      math.floor(math.log(2.0) * 1e6).toLong
    val expAlpha = math.floor(3.0 / (s / 1e6) * 1e6 + 0.5) / 1e6
    val r = Stats.hillTail(df, 4).collect().head
    assert(r.getAs[Long]("k") == 4L)
    assert(r.getAs[Long]("x_k") == 2L)
    assert(r.getAs[Double]("hill_alpha") == expAlpha)
    // all-equal tail -> s = 0 -> guarded null
    val flat = Seq((0L, "t", "en", "s", 5L), (1L, "t", "en", "s", 5L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    assert(Stats.hillTail(flat, 2).collect().head.isNullAt(2))
  }

  test("mann-kendall: monotone series z, constant series guarded null") {
    import spark.implicits._
    import java.sql.Timestamp
    def df(rev: Seq[Double]) = rev.zipWithIndex.map { case (p, d) =>
      (Timestamp.valueOf(f"1970-01-0${d + 1} 00:00:00"), p)
    }.toDF("o_orderdate", "o_totalprice")
    val up = Stats.mannKendall(df(Seq(1.0, 2.0, 3.0))).collect().head
    assert(up.getAs[Long]("s_stat") == 3L)
    assert(up.getAs[Long]("var18") == 66L) // 3*2*11, no ties
    val expZ = math.floor(2.0 / math.sqrt(66.0 / 18.0) * 1e6 + 0.5) / 1e6
    assert(up.getAs[Double]("z") == expZ)
    val const = Stats.mannKendall(df(Seq(5.0, 5.0, 5.0))).collect().head
    assert(const.getAs[Long]("s_stat") == 0L)
    assert(const.getAs[Long]("var18") == 0L) // ties cancel the variance
    assert(const.isNullAt(4))
  }

  test("dow anova: pure weekday pattern explains everything, constant nothing") {
    import spark.implicits._
    import java.sql.Timestamp
    def days(rev: Int => Double, nDays: Int) = (0 until nDays).map { i =>
      (Timestamp.valueOf(f"2024-01-${i + 1}%02d 12:00:00"), rev(i))
    }.toDF("ts", "value")
    // two full weeks whose revenue depends ONLY on the weekday
    val pure = Stats.dowAnova(days(i => 10.0 + (i % 7), 14)).collect().head
    assert(pure.getAs[Long]("n_days") == 14L && pure.getAs[Long]("n_dows") == 7L)
    assert(pure.getAs[Double]("eta_sq") == 1.0)
    // constant revenue: total variance zero -> guarded null
    val const = Stats.dowAnova(days(_ => 5.0, 14)).collect().head
    assert(const.isNullAt(2))
  }

  test("kendall tau-b: hand-counted concordance and full-tie null guard") {
    import spark.implicits._
    import java.sql.Timestamp
    def o(day: Int, price: Double) =
      (Timestamp.valueOf(f"2024-01-$day%02d 10:00:00"), price)
    // daily: (d1: rev 1000, cnt 1) (d2: rev 3000, cnt 2) (d3: rev 1500, cnt 3)
    // pairs: 1-2 concordant, 1-3 concordant, 2-3 discordant -> tau = 1/3
    val orders = Seq(o(1, 10.00), o(2, 10.00), o(2, 20.00),
      o(3, 5.00), o(3, 5.00), o(3, 5.00))
      .toDF("o_orderdate", "o_totalprice")
    val r = Stats.kendallTau(orders).collect().head
    assert(r.getAs[Long]("n_days") == 3L && r.getAs[Long]("n_pairs") == 3L)
    assert(r.getAs[Long]("concordant") == 2L && r.getAs[Long]("discordant") == 1L)
    assert(r.getAs[Long]("tie_rev") == 0L && r.getAs[Long]("tie_cnt") == 0L)
    assert(r.getAs[Double]("tau_b") == 0.333333)
    // constant: every pair ties on both variables -> denominator 0 -> null
    val const = Seq(o(1, 7.00), o(2, 7.00), o(3, 7.00))
      .toDF("o_orderdate", "o_totalprice")
    assert(Stats.kendallTau(const).collect().head.isNullAt(6))
  }

  test("srm check: balanced split is silent, one-sided split flags") {
    import spark.implicits._
    // duplicates must not count twice: allocation is over distinct users
    val balanced = ((0L to 9L) ++ (0L to 9L)).toDF("user_id")
    val b = Stats.srmCheck(balanced).collect().head
    assert((b.getLong(0), b.getLong(1), b.getDouble(2), b.getLong(3)) ==
      ((5L, 5L, 0.0, 0L)))
    val skewed = Seq(1L, 3L, 5L, 7L).toDF("user_id")
    val s = Stats.srmCheck(skewed).collect().head
    // chi2 = (0-4)^2/4 = 4.0 > 3.841 -> flag
    assert((s.getLong(0), s.getLong(1), s.getDouble(2), s.getLong(3)) ==
      ((0L, 4L, 4.0, 1L)))
  }

  test("ccf ladder: lag-0 equals the direct Pearson; pair counts shrink by lag") {
    import spark.implicits._
    import java.sql.Timestamp
    // day d carries d events of value d + 0.37 -> rev(d) = d*(100d+37),
    // cnt(d) = d over days 1..5
    val evs = for { d <- 1 to 5; _ <- 1 to d }
      yield (Timestamp.valueOf(f"2024-01-0$d%1d 08:00:00"), d + 0.37)
    val rows = Stats.ccfLadder(evs.toDF("ts", "value")).collect()
      .map(r => r.getInt(0).toLong ->
        (r.getLong(1), if (r.isNullAt(2)) Double.NaN else r.getDouble(2))).toMap
    (0 to 4).foreach(l => assert(rows(l.toLong)._1 == (5 - l).toLong))
    assert(!rows.contains(5L), "empty lags emit no row")
    assert(rows(4L)._2.isNaN, "a single-pair lag has no defined correlation")
    val daily = (1 to 5).map(d => (d.toLong * (100L * d + 37L), d.toLong))
    def pearson(xs: Seq[Long], ys: Seq[Long]): Double = {
      val n = xs.size.toDouble
      val sx = xs.sum.toDouble; val sy = ys.sum.toDouble
      val sxx = xs.map(x => x * x).sum.toDouble
      val syy = ys.map(y => y * y).sum.toDouble
      val sxy = xs.zip(ys).map { case (x, y) => x * y }.sum.toDouble
      (n * sxy - sx * sy) /
        (math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy))
    }
    val exp0 = pearson(daily.map(_._1), daily.map(_._2))
    assert(rows(0L)._2 == math.floor(exp0 * 1e9 + 0.5) / 1e9)
  }

  test("ess composes exactly the published acf ladder") {
    val ev = Tables.events(spark, sf("sf0.001"))
    val acfs = Stats.acfLadder(ev).collect()
      .map(r => if (r.isNullAt(2)) 0.0 else r.getDouble(2))
    val snano = acfs.map(a => math.floor(a * 1e9 + 0.5).toLong).sum
    val r = Stats.essDays(ev).collect().head
    assert(r.getAs[Double]("sum_acf") ==
      math.floor(snano.toDouble / 1e9 * 1e9 + 0.5) / 1e9)
    val den = 1.0 + (2.0 * snano.toDouble) / 1e9
    val expEss = r.getAs[Long]("n_days").toDouble / den
    assert(r.getAs[Double]("ess_days") ==
      math.floor(expEss * 1e6 + 0.5) / 1e6)
    assert(r.getAs[Double]("overconfidence") > 0.0)
  }

  test("ratio CI: hand delta-method on two users, single-user null") {
    import spark.implicits._
    // u1: 2 purchases of 1.00 (x=200, y=2); u2: 2 clicks (x=0, y=2)
    // R = 200/4 = 50; sum d^2 = 40000 - 2*50*400 + 2500*8 = 20000
    // var = 20000*2/(1*16) = 2500 -> se = 50
    val ev = Seq((1L, "purchase", 1.0), (1L, "purchase", 1.0),
      (2L, "click", 9.0), (2L, "click", 9.0))
      .toDF("user_id", "event_type", "value")
    val r = Stats.ratioCi(ev).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((2L, 200L, 4L)))
    assert(r.getAs[Double]("ratio") == 50.0)
    assert(r.getAs[Double]("se") == 50.0)
    assert(r.getAs[Double]("ci_lo") ==
      math.floor((50.0 - 1.959964 * 50.0) * 1e9 + 0.5) / 1e9)
    val single = Seq((1L, "click", 1.0)).toDF("user_id", "event_type", "value")
    assert(Stats.ratioCi(single).collect().head.isNullAt(4))
  }

  test("cohens d: hand-computed pooled standardization, zero-variance null") {
    import spark.implicits._
    // a = {1, 3}, b = {5, 7}: both variances 2, pooled 2,
    // d = (2 - 6)/sqrt(2)
    val df = Seq(("a", 1L), ("a", 3L), ("b", 5L), ("b", 7L))
      .toDF("g", "v")
    val r = Stats.cohensDPairwise(df, "g", "v").collect().head
    val va = (2.0 * 10.0 - 4.0 * 4.0) / (2.0 * 1.0)
    val vb = (2.0 * 74.0 - 12.0 * 12.0) / (2.0 * 1.0)
    val pooled = (1.0 * va + 1.0 * vb) / 2.0
    val d = (4.0 / 2.0 - 12.0 / 2.0) / math.sqrt(pooled)
    assert(r.getAs[Double]("cohens_d") == math.floor(d * 1e6 + 0.5) / 1e6)
    // constant groups: pooled variance 0 -> null
    val const = Seq(("a", 5L), ("a", 5L), ("b", 5L), ("b", 5L))
      .toDF("g", "v")
    assert(Stats.cohensDPairwise(const, "g", "v").collect().head.isNullAt(4))
  }

  test("runs test: oscillation maximizes runs, monotone trend minimizes them") {
    import spark.implicits._
    import java.sql.Timestamp
    def series(vals: Seq[Double]) = vals.zipWithIndex.map { case (v, i) =>
      (Timestamp.valueOf(f"2024-01-${i + 1}%02d 06:00:00"), v) }
      .toDF("ts", "value")
    // median day (value 4) drops; remaining signs alternate -> 6 runs
    val osc = Stats.runsTest(series(Seq(1, 9, 2, 8, 3, 7, 4).map(_.toDouble)))
      .collect().head
    assert((osc.getLong(0), osc.getLong(1), osc.getLong(2)) == ((3L, 3L, 6L)))
    val expZ = (6.0 - (2.0 * 3 * 3 / 6.0 + 1.0)) /
      math.sqrt(2.0 * 3 * 3 * (2.0 * 3 * 3 - 6.0) / (6.0 * 6.0 * 5.0))
    assert(osc.getAs[Double]("z") == math.floor(expZ * 1e6 + 0.5) / 1e6)
    // strictly increasing: lows then highs -> exactly 2 runs, z < 0
    val mono = Stats.runsTest(series((1 to 7).map(_.toDouble)))
      .collect().head
    assert(mono.getLong(2) == 2L && mono.getAs[Double]("z") < 0.0)
  }

  test("dispersion census: constant days are 0, clumped days hand-compute") {
    import spark.implicits._
    import java.sql.Timestamp
    def ev(day: Int, t: String, k: Int) = (1 to k).map(_ =>
      (Timestamp.valueOf(f"2024-01-$day%02d 01:00:00"), t))
    // "m": 2 events on each of 3 days -> variance 0 -> D = 0
    // "b": 1 then 3 events -> D = (2*10 - 16) / (2*4) = 0.5
    val events = (ev(1, "m", 2) ++ ev(2, "m", 2) ++ ev(3, "m", 2) ++
      ev(1, "b", 1) ++ ev(2, "b", 3)).toDF("ts", "event_type")
    val m = Stats.dispersionCensus(events).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(m("m") == ((3L, 6L, 2.0, 0.0)))
    assert(m("b") == ((2L, 4L, 2.0, 0.5)))
  }

  test("capture-recapture: hand-counted overlap gives the Chapman estimate") {
    import spark.implicits._
    import java.sql.Timestamp
    // days 1..4 -> first half = days 1,2. Users 1-6 in H1, 4-10 in H2:
    // n1=6, n2=7, overlap m=3, true total 10
    val ev = ((1L to 6L).map(u => (Timestamp.valueOf("2024-01-01 10:00:00"), u)) ++
      (4L to 10L).map(u => (Timestamp.valueOf("2024-01-04 10:00:00"), u)))
      .toDF("ts", "user_id")
    val r = Stats.captureRecapture(ev).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((6L, 7L, 3L, 10L)))
    // chapman = 7*8/4 - 1 = 13; rel_err = (13-10)/10 = 0.3
    assert(r.getAs[Double]("chapman_est") == 13.0)
    assert(r.getAs[Double]("rel_err") == 0.3)
  }

  test("perm test: constant series is never beaten, a hard shift is rarely matched") {
    import spark.implicits._
    import java.sql.Timestamp
    def ev(day: Int, v: Double) =
      (Timestamp.valueOf(f"2024-01-$day%02d 09:00:00"), v)
    // constant revenue: every relabeling ties the observed 0 gap -> p = 1
    val const = (1 to 10).map(d => ev(d, 5.0)).toDF("ts", "value")
    val rc = Stats.permTest(const).collect().head
    assert(rc.getAs[Long]("n_days") == 10L)
    assert(rc.getAs[Double]("obs_diff") == 0.0)
    assert(rc.getAs[Double]("p_value") == 1.0)
    // hard level shift: first half 1.00, second half 100.00
    val shift = (1 to 10).map(d => ev(d, if (d <= 5) 1.0 else 100.0))
      .toDF("ts", "value")
    val rs = Stats.permTest(shift).collect().head
    // labeled g=1 is the FIRST half (day*2 <= dmin+dmax), so the
    // observed gap is mean(first) - mean(second) = 100 - 10000 cents
    assert(rs.getAs[Double]("obs_diff") == -9900.0)
    val nValid = rs.getAs[Long]("n_valid")
    assert(nValid >= 60L && nValid <= 64L)
    assert(rs.getAs[Double]("p_value") < 0.5,
      "a maximal shift should beat most random relabelings")
  }

  test("theil index: zero at equality, hand micro-nat value when concentrated") {
    import spark.implicits._
    import java.sql.Timestamp
    def o(p: Double) = (Timestamp.valueOf("2024-01-01 00:00:00"), p)
    val eq = Seq(o(5.0), o(5.0), o(5.0)).toDF("o_orderdate", "o_totalprice")
    val r0 = Stats.theilIndex(eq).collect().head
    assert(r0.getAs[Long]("n_orders") == 3L && r0.getAs[Double]("theil") == 0.0)
    // values 100,100,100,300 cents: mu = 150, S = 600
    val sk = Seq(o(1.0), o(1.0), o(1.0), o(3.0)).toDF("o_orderdate", "o_totalprice")
    val r1 = Stats.theilIndex(sk).collect().head
    val t100 = math.floor(math.log(100.0 / (600.0 / 4.0)) * 1e6 + 0.5).toLong
    val t300 = math.floor(math.log(300.0 / (600.0 / 4.0)) * 1e6 + 0.5).toLong
    val expected = (3L * 100L * t100 + 300L * t300).toDouble / (600.0 * 1e6)
    assert(r1.getAs[Double]("theil") == math.floor(expected * 1e9 + 0.5) / 1e9)
  }

  test("mde power: hand-computed tree on a tiny balanced design") {
    import spark.implicits._
    val ev = Seq((0L, "purchase"), (1L, "click"), (2L, "click"),
      (3L, "purchase")).toDF("user_id", "event_type")
    val r = Stats.mdePower(ev).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((2L, 1L, 2L, 1L)))
    assert(r.getAs[Double]("p_pool") == 0.5)
    val e = (1.959964 + 0.841621) *
      math.sqrt(0.5 * (1.0 - 0.5) * (1.0 / 2.0 + 1.0 / 2.0))
    assert(r.getAs[Double]("mde_abs") == math.floor(e * 1e9 + 0.5) / 1e9)
    assert(r.getAs[Double]("mde_rel") == math.floor(e / 0.5 * 1e9 + 0.5) / 1e9)
  }

  test("decile shift ladder: constant translation shows as a flat shift") {
    import spark.implicits._
    val part = (1L to 2L).map(k => (k, if (k == 1) "PROMO" else "STANDARD"))
      .toDF("p_partkey", "p_type")
    // promo prices 1..10 dollars, base prices 11..20: every decile
    // shifts by exactly -10.00
    val li = ((1 to 10).map(i => (1L, i.toDouble)) ++
      (1 to 10).map(i => (2L, (10 + i).toDouble)))
      .toDF("l_partkey", "l_extendedprice")
    val rows = Stats.decileShift(li, part).collect()
    assert(rows.length == 9)
    rows.foreach { r =>
      val d = r.getAs[Long]("decile")
      assert(r.getAs[Long]("promo_cents") == d * 100L)
      assert(r.getAs[Long]("base_cents") == (10 + d) * 100L)
      assert(r.getAs[Long]("shift_cents") == -1000L)
    }
  }

  test("skyline keeps exactly the non-dominated points, including equal twins") {
    import spark.implicits._
    val parts = Seq(
      (1L, 10, 5.00), // dominated by 4: smaller and pricier
      (2L, 20, 3.00), // frontier
      (3L, 20, 3.00), // exact twin of 2 — neither dominates, both kept
      (4L, 15, 2.00), // frontier
      (5L, 20, 4.00), // dominated by 2: same size, pricier
      (6L, 25, 9.00), // frontier: nothing larger exists
      (7L, 15, 2.50)  // dominated by 4: same size, pricier
    ).toDF("p_partkey", "p_size", "p_retailprice")
    val got = Stats.skylineParts(parts).collect().map(_.getLong(0)).toSet
    assert(got == Set(2L, 3L, 4L, 6L))
  }

  test("x64 perm FDR: strong effect rejects, null effect ranks last at p=1") {
    import spark.implicits._
    import java.sql.Timestamp
    def ts(day: Int) = Timestamp.valueOf(f"2024-01-$day%02d 12:00:00")
    // type "trend": revenue doubles in the second half -> huge half-gap.
    // type "flat": identical revenue every day -> obs_diff = 0, so EVERY
    // permutation diff (whatever it is) satisfies |pd| >= 0 -> p = 1.
    val rows = (1 to 20).flatMap { d =>
      Seq((ts(d), 100L + d.toLong, "trend",
             if (d <= 10) 1.00 else 1000.00),
          (ts(d), 200L + d.toLong, "flat", 5.00))
    }.zipWithIndex.map { case ((t, u, e, v), i) => (i.toLong, t, u, e, v) }
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val r = Stats.permFdr(rows).collect()
    assert(r.length == 2)
    val byType = r.map(x => x.getAs[String]("event_type") -> x).toMap
    val trend = byType("trend"); val flat = byType("flat")
    assert(flat.getAs[Double]("p_value") == 1.0,
      "a zero observed gap can never beat its permutations")
    assert(trend.getAs[Double]("p_value") < flat.getAs[Double]("p_value"))
    assert(trend.getAs[Long]("p_rank") == 1L && flat.getAs[Long]("p_rank") == 2L)
    assert(trend.getAs[Long]("n_tests") == 2L)
    // BH at 10%: rank-1 needs p <= 0.05 -> the strong effect passes,
    // p = 1 never does; rejections must be a prefix of the rank order
    assert(trend.getAs[Long]("bh_rejected") == 1L)
    assert(flat.getAs[Long]("bh_rejected") == 0L)
    r.foreach { x =>
      assert(x.getAs[Long]("n_ge") <= x.getAs[Long]("n_valid"))
      assert(x.getAs[Long]("n_valid") <= Stats.DefaultPerms.toLong)
    }
  }

  test("x66 jackknife: constant days give zero SE; a single day has no pseudo-values") {
    import spark.implicits._
    import java.sql.Timestamp
    def ts(day: Int) = Timestamp.valueOf(f"2024-01-$day%02d 12:00:00")
    // 10 identical days (two 3.00 events each): every leave-one-out
    // ratio equals the full ratio 300 cents/event -> SE exactly 0
    val const = (1 to 10).flatMap(d =>
      Seq((ts(d), 1L, 3.00), (ts(d), 2L, 3.00)))
      .zipWithIndex.map { case ((t, u, v), i) => (i.toLong, t, u, "e", v) }
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val rc = Stats.jackknifeRatio(const).collect().head
    assert(rc.getAs[Long]("n_days") == 10L && rc.getAs[Long]("n_valid") == 10L)
    assert(rc.getAs[Double]("ratio") == 300.0)
    assert(rc.getAs[Double]("se_jack") == 0.0,
      s"identical blocks must have zero jackknife spread: $rc")
    assert(rc.getAs[Double]("ci_lo") == 300.0 && rc.getAs[Double]("ci_hi") == 300.0)

    // one heavy outlier day -> nonzero SE, CI brackets the ratio
    val skew = ((1 to 9).flatMap(d => Seq((ts(d), 1L, 3.00))) ++
        Seq((ts(10), 1L, 900.00)))
      .zipWithIndex.map { case ((t, u, v), i) => (i.toLong, t, u, "e", v) }
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val rs = Stats.jackknifeRatio(skew).collect().head
    assert(rs.getAs[Double]("se_jack") > 0.0)
    assert(rs.getAs[Double]("ci_lo") < rs.getAs[Double]("ratio"))
    assert(rs.getAs[Double]("ci_hi") > rs.getAs[Double]("ratio"))

    // a single day: deleting it leaves nothing -> no pseudo-values, null SE
    val one = Seq((0L, ts(1), 1L, "e", 3.00))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val r1 = Stats.jackknifeRatio(one).collect().head
    assert(r1.getAs[Long]("n_valid") == 0L)
    assert(r1.isNullAt(r1.fieldIndex("se_jack")))
  }

  test("x66 jackknife matches a BigInt brute-force replay of the quantized formula") {
    import spark.implicits._
    import java.sql.Timestamp
    def ts(day: Int) = Timestamp.valueOf(f"2024-01-$day%02d 12:00:00")
    // irregular day blocks: (cents, events) per day
    val days = Seq((300L, 2L), (1250L, 3L), (90L, 1L), (4000L, 4L), (777L, 2L))
    val rows = days.zipWithIndex.flatMap { case ((cents, n), d) =>
      // n events summing to `cents`: n-1 events of 1 cent + remainder
      (1L until n).map(_ => (ts(d + 1), 0.01)) :+ (ts(d + 1), (cents - (n - 1)) / 100.0)
    }.zipWithIndex.map { case ((t, v), i) => (i.toLong, t, 1L, "e", v) }
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val got = Stats.jackknifeRatio(rows).collect().head
    // brute-force the same quantized pipeline with BigInt arithmetic
    val sx = days.map(_._1).sum; val sy = days.map(_._2).sum
    val r12 = days.map { case (x, y) =>
      BigInt(math.floor((sx - x).toDouble / (sy - y).toDouble * 1e12).toLong)
    }
    val nv = r12.size
    val sr = r12.sum
    val css = r12.map(r => (r * nv - sr) * (r * nv - sr)).sum
    val se = math.sqrt((nv - 1).toDouble / nv *
      (css.toDouble / (nv.toDouble * nv.toDouble * 1e24)))
    def q9(x: Double) = math.floor(x * 1e9 + 0.5) / 1e9
    assert(got.getAs[Long]("n_valid") == nv.toLong)
    assert(got.getAs[Double]("ratio") == q9(sx.toDouble / sy.toDouble))
    assert(got.getAs[Double]("se_jack") == q9(se),
      s"engine ${got.getAs[Double]("se_jack")} != replay ${q9(se)}")
  }

  test("x66 jackknife nulls the SE on decimal overflow instead of understating it") {
    import spark.implicits._
    import java.sql.Timestamp
    def ts(day: Int) = Timestamp.valueOf(f"2024-01-$day%02d 12:00:00")
    // one whale day (120000.00 = 1.2e7 cents) against four penny days:
    // removing the whale swings the leave-one-out ratio so far that its
    // centered term (n·r_d − Σr)² ≈ 1.44e38 exceeds DECIMAL(38,0) and
    // Spark silently nulls THAT ROW (allowPrecisionLoss) while the four
    // surviving squares still sum to ≈3.6e37 — so sum() alone would
    // return a plausible but understated css (ADVICE r12). The css_n
    // guard must detect the dropped term and null the SE and CI.
    val rows = Seq(120000.00, 0.01, 0.02, 0.03, 0.04).zipWithIndex
      .map { case (v, d) => (d.toLong, ts(d + 1), 1L, "e", v) }
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val r = Stats.jackknifeRatio(rows).collect().head
    assert(r.getAs[Long]("n_valid") == 5L)
    assert(!r.isNullAt(r.fieldIndex("ratio")), "the ratio itself is exact and stays")
    assert(r.isNullAt(r.fieldIndex("se_jack")),
      s"overflow must null the SE, not understate it: $r")
    assert(r.isNullAt(r.fieldIndex("ci_lo")) && r.isNullAt(r.fieldIndex("ci_hi")))
  }

  test("x64 BH reject set is internally consistent with its own ranks and p-values") {
    import spark.implicits._
    import java.sql.Timestamp
    def ts(day: Int, h: Int) = Timestamp.valueOf(f"2024-01-$day%02d $h%02d:00:00")
    // four types with different half-gap strengths
    val rows = (1 to 16).flatMap { d =>
      Seq(("a", if (d <= 8) 1.0 else 500.0), ("b", if (d <= 8) 5.0 else 5.5),
          ("c", 7.0), ("d", if (d <= 8) 2.0 else 200.0))
        .map { case (e, v) => (ts(d, 6), e, v) }
    }.zipWithIndex.map { case ((t, e, v), i) => (i.toLong, t, 1L, e, v) }
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val r = Stats.permFdr(rows).collect()
    val m = r.length.toLong
    // brute-force BH over the reported (rank, n_ge, n_valid) integers
    val pass = r.map(x => x.getAs[Long]("p_rank") ->
      (100L * m * x.getAs[Long]("n_ge") <=
        x.getAs[Long]("p_rank") * Stats.DefaultFdrAlphaPct * x.getAs[Long]("n_valid")))
      .toMap
    val kMax = pass.collect { case (rk, true) => rk }.foldLeft(0L)(math.max)
    r.foreach { x =>
      val expect = if (x.getAs[Long]("p_rank") <= kMax) 1L else 0L
      assert(x.getAs[Long]("bh_rejected") == expect,
        s"BH mismatch at ${x.getAs[String]("event_type")}: $x (kMax=$kMax)")
    }
    // ranks are a permutation of 1..m ordered by p (ties by type)
    assert(r.map(_.getAs[Long]("p_rank")).sorted.toSeq == (1L to m))
    val byRank = r.sortBy(_.getAs[Long]("p_rank")).map(_.getAs[Double]("p_value"))
    assert(byRank.zip(byRank.tail).forall { case (a, b) => a <= b },
      "p-values must be nondecreasing in rank")
  }
}
