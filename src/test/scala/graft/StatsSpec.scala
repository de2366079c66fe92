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
}
