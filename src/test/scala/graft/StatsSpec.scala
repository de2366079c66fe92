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
