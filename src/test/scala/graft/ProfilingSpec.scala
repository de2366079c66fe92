package graft

import graft.operators.Profiling

class ProfilingSpec extends SparkSpec {
  import spark.implicits._

  test("exact percentiles follow the ceil(p*n) rank rule") {
    // n=10, values 1..10 → p50 = rank 5 → 5.0; p95 = rank ceil(9.5)=10 → 10.0
    val df = (1 to 10).map(i => ("a", i.toDouble, i.toLong))
      .toDF("k", "v", "id")
    val got = Profiling.exactPercentiles(df, "k", "v", "id")
      .as[(String, Double, Double)].collect().head
    assert(got === (("a", 5.0, 10.0)))
  }

  test("percentiles are computed independently per group") {
    val df = ((1 to 4).map(i => ("lo", i.toDouble, i.toLong)) ++
      (1 to 4).map(i => ("hi", i * 100.0, (i + 10).toLong)))
      .toDF("k", "v", "id")
    val got = Profiling.exactPercentiles(df, "k", "v", "id")
      .as[(String, Double, Double)].collect().map(r => r._1 -> r._2).toMap
    assert(got === Map("lo" -> 2.0, "hi" -> 200.0)) // rank ceil(4*0.5)=2
  }

  test("histogram clamps the overflow bucket and conserves rows") {
    val df = Seq(0L, 499L, 500L, 5001L, 99999L).toDF("n_chars")
    val got = Profiling.histogram(df, "n_chars", 500.0, 10L)
      .as[(Long, Long)].collect().toMap
    assert(got === Map(0L -> 2L, 1L -> 1L, 10L -> 2L))
    assert(got.values.sum === 5L)
  }

  test("sketch quantiles sit within one bin width above the exact percentiles") {
    val ev = Tables.events(spark, sf("sf0.01"))
    val exact = Profiling
      .exactPercentiles(ev, "event_type", "value", "event_id")
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val approx = Profiling
      .sketchQuantiles(ev, "event_type", "value")
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    approx.foreach { case (k, (a50, a95)) =>
      val (e50, e95) = exact(k)
      assert(a50 >= e50 && a50 - e50 <= 0.011, s"$k p50: sketch $a50 vs exact $e50")
      assert(a95 >= e95 && a95 - e95 <= 0.011, s"$k p95: sketch $a95 vs exact $e95")
    }
  }

  test("column profile: one row per column, null and distinct counts exact") {
    import spark.implicits._
    val df = Seq((Some(1L), Some("a")), (Some(1L), None), (None, Some("b")))
      .toDF("k", "v")
    val m = Profiling.columnProfile(df).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(m == Map("k" -> (1L, 1L), "v" -> (1L, 2L)))
  }

  test("schema drift: midpoint-day split, per-period nulls and distincts in one pass") {
    import spark.implicits._
    import java.sql.Timestamp
    def dts(day: Int) = Timestamp.valueOf(f"1970-01-0${day + 1} 10:00:00")
    // days 0..3 -> split at day 2: a = days 0,1; b = days 2,3
    val df = Seq(
      (1L, dts(0), 1L, "view", 1.0, "{}"),
      (2L, dts(1), 1L, "view", 1.0, null),
      (3L, dts(2), 2L, "click", 2.0, "{}"),
      (4L, dts(3), 3L, null, 2.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val m = Profiling.schemaDrift(df).collect()
      .map(r => r.getAs[String]("column_name") -> r).toMap
    assert(m("event_type").getAs[Long]("rows_a") == 2L)
    assert(m("event_type").getAs[Long]("rows_b") == 2L)
    assert(m("event_type").getAs[Long]("nulls_a") == 0L)
    assert(m("event_type").getAs[Long]("nulls_b") == 1L)
    assert(m("event_type").getAs[Long]("distinct_a") == 1L) // view
    assert(m("event_type").getAs[Long]("distinct_b") == 1L) // click
    assert(m("props").getAs[Long]("nulls_a") == 1L)
    assert(m("user_id").getAs[Long]("distinct_a") == 1L)
    assert(m("user_id").getAs[Long]("distinct_b") == 2L)
  }

  test("fk orphans: dangling child keys counted, duplicates kept, clean is zero") {
    import spark.implicits._
    val parent = Seq(1L, 2L).toDF("pk")
    val child = Seq(1L, 1L, 3L, 3L).toDF("fk")
    val r = Profiling.fkOrphans(child, "fk", parent, "pk", "c->p")
      .collect().head
    assert(r.getAs[String]("relationship") == "c->p")
    assert(r.getAs[Long]("n_child") == 4L)
    assert(r.getAs[Long]("n_orphans") == 2L, "every orphan ROW counts")
    // the real star schema is referentially clean at sf0.01
    val census = Profiling.fkCensus(spark, sf("sf0.01")).collect()
    assert(census.length == 4)
    census.foreach(c => assert(c.getAs[Long]("n_orphans") == 0L, c.toString))
  }

  test("hll calibration: exact counts per column, all-null columns drop out") {
    import spark.implicits._
    import java.sql.Timestamp
    val ev = (1 to 10).map(i => (Timestamp.valueOf("2024-01-01 00:00:00"),
      i.toLong, if (i % 2 == 0) "click" else "view", i * 1.0,
      null.asInstanceOf[String]))
      .toDF("ts", "user_id", "event_type", "value", "props")
    val rows = Profiling.hllCalibration(ev).collect()
      .map(r => r.getAs[String]("column_name") -> r).toMap
    assert(rows.keySet == Set("event_type", "user_id", "value_cents"),
      "all-null props has no distinct values and drops out")
    assert(rows("event_type").getAs[Long]("exact_distinct") == 2L)
    assert(rows("user_id").getAs[Long]("exact_distinct") == 10L)
    assert(rows("value_cents").getAs[Long]("exact_distinct") == 10L)
    rows.values.foreach { r =>
      val exact = r.getAs[Long]("exact_distinct").toDouble
      val est = r.getAs[Double]("hll_estimate")
      val expected = math.floor((est - exact) / exact * 1e6 + 0.5) / 1e6
      assert(r.getAs[Double]("rel_err") == expected)
    }
  }

  test("zone-map skip census: disjoint zones skip, straddling zones scan") {
    import spark.implicits._
    import java.sql.Timestamp
    def row(ok: Long, d: String) = (ok, Timestamp.valueOf(s"$d 00:00:00"))
    val li = Seq(
      row(0L, "1995-03-01"), row(10L, "1995-04-15"),       // zone 0: all before
      row(8192L, "1995-05-20"), row(8200L, "1995-07-15"),  // zone 1: straddles
      row(16384L, "1995-10-01")                            // zone 2: all after
    ).toDF("l_orderkey", "l_shipdate")
    val r = Profiling.zoneMapSkips(li).collect().head
    assert(r.getAs[Long]("n_zones") == 3L)
    assert(r.getAs[Long]("n_skipped") == 2L)
    assert(r.getAs[Long]("n_rows") == 5L)
    assert(r.getAs[Long]("rows_scanned") == 2L, "only the straddling zone scans")
    assert(r.getAs[Long]("rows_matched") == 1L, "one row actually in range")
    assert(r.getAs[Double]("scan_frac") == 0.4)
  }
}
