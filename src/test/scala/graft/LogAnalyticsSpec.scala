package graft

import org.apache.spark.sql.functions._
import graft.operators.LogAnalytics

/** Golden parser tests over verbatim reference log formats (FIXTURES.md
  * §A; producer `wheel/monitor_real.sh:59-62`, `run_mr_real.sh`). */
class LogAnalyticsSpec extends SparkSpec {
  import spark.implicits._

  test("A1: monitor sample line parses node/cpu/mem (golden)") {
    val lines = Seq(
      (1L, "[worker1-zzh] CPU: 10% | MEM: 21%"),
      (2L, "[worker2-zrt] CPU: 36% | MEM: 28%"),
      (3L, "===== Real Performance Monitor Started ====="), // header → no match
      (4L, "----")                                           // delimiter → no match
    ).toDF("event_id", "line")
    val got = LogAnalytics.parseMonitorLine(lines)
      .orderBy("event_id")
      .as[(Long, String, Option[Long], Option[Long])].collect()
    assert(got(0) === ((1L, "worker1-zzh", Some(10L), Some(21L))))
    assert(got(1) === ((2L, "worker2-zrt", Some(36L), Some(28L))))
    assert(got(2)._2 === "") // header doesn't match the sample regex
    assert(got(3)._2 === "")
  }

  test("A3: progress line parses ts/map/reduce (golden, reference format)") {
    val lines = Seq(
      (1L, "2025-11-28 19:24:41,180 INFO mapreduce.Job:  map 0% reduce 0%"),
      (2L, "2025-11-28 19:26:52,410 INFO mapreduce.Job:  map 100% reduce 32%"))
      .toDF("event_id", "line")
    val got = LogAnalytics.parseProgressLine(lines).orderBy("event_id")
      .select(date_format(col("pts"), "yyyy-MM-dd HH:mm:ss"),
        col("map_pct"), col("red_pct"))
      .as[(String, Int, Int)].collect()
    assert(got(0) === (("2025-11-28 19:24:41", 0, 0)))
    assert(got(1) === (("2025-11-28 19:26:52", 100, 32)))
  }

  test("A10: path dims parse both flat and nested layouts, dataset uppercased") {
    val paths = Seq(
      (1L, "MapReduceLog/_100mb_slowstart_0.5/20251128_192422/monitor.log"),
      (2L, "MapReduceLog/_5G_slowstart_1.0/job_output.log"), // flat layout
      (3L, "MapReduceLog/not_a_run/foo.log"))
      .toDF("event_id", "path")
    val got = LogAnalytics.parseRunPath(paths).orderBy("event_id")
      .as[(Long, String, Option[Double])].collect()
    assert(got(0) === ((1L, "100MB", Some(0.5))))
    assert(got(1) === ((2L, "5G", Some(1.0))))
    assert(got(2)._2 === "") // non-matching dirs are skipped upstream
  }

  test("A5/A6: stage detect on <2 records falls back to the only event") {
    val ev = Seq((1L, java.sql.Timestamp.valueOf("2025-11-28 19:24:41"), 7L, "view", 1.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val fb = LogAnalytics.nthFromEnd(ev).collect()
    assert(fb.length === 1)
    assert(fb(0).getTimestamp(1).toString.startsWith("2025-11-28 19:24:41"))
  }

  test("A7: zero-shuffle degenerate path yields 0.0 durations (common_utils.py:131-133)") {
    // one user, no 'purchase' events, no value>5 → map/shuffle/reduce all 0
    val ev = Seq(
      (1L, java.sql.Timestamp.valueOf("2025-11-28 19:24:41"), 7L, "view", 1.0),
      (2L, java.sql.Timestamp.valueOf("2025-11-28 19:25:41"), 7L, "click", 2.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val d = LogAnalytics.stageDurations(ev).as[(Long, Double, Double, Double, Double)].head()
    assert(d === ((7L, 60.0, 0.0, 0.0, 0.0)))
  }

  test("a22: cohort CV from exact moments; constant cohort 0, zero-mean null") {
    import java.sql.Timestamp
    def t(min: Int) = Timestamp.valueOf(f"2025-11-28 19:$min%02d:00")
    // cohort 1 (users 1, 11): durations 10 and 20 min*60 -> in seconds
    // mean 900, sd 300 (pop), cv 1/3; cohort 2 (users 2, 12): both 600
    // -> cv 0; cohort 3 (user 3): single event -> duration 0 -> null cv
    val ev = Seq(
      (1L, t(0), 1L, "view", 1.0), (2L, t(10), 1L, "view", 1.0),
      (3L, t(0), 11L, "view", 1.0), (4L, t(20), 11L, "view", 1.0),
      (5L, t(0), 2L, "view", 1.0), (6L, t(10), 2L, "view", 1.0),
      (7L, t(0), 12L, "view", 1.0), (8L, t(10), 12L, "view", 1.0),
      (9L, t(0), 3L, "view", 1.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    // drive the same shape directly: durations -> moments -> cv
    val got = LogAnalytics.stageDurations(ev)
      .select((col("user_id") % 10).as("cohort"),
        col("total_s").cast("long").as("x"))
      .groupBy("cohort")
      .agg(count(lit(1)).as("n"), sum("x").as("sx"),
        sum(col("x") * col("x")).as("sxx"))
      .select(col("cohort"),
        graft.functions.Parity.pround(expr(operators.LogAnalytics.cvExpr), 6)
          .as("cv"))
      .collect().map(r => r.getAs[Long]("cohort") ->
        Option(r.get(1)).map(_.asInstanceOf[Double])).toMap
    assert(got(1L) == Some(0.333333))
    assert(got(2L) == Some(0.0))
    assert(got(3L).isEmpty, "zero-mean cohort must guard to null")
  }

  test("A8: overlap ratio is clamped to [0, 100] over real data") {
    val r = LogAnalytics.overlapRatio(Tables.events(spark, sf("sf0.001")))
      .agg(min(col("overlap_pct")), max(col("overlap_pct")))
      .as[(Double, Double)].head()
    assert(r._1 >= 0.0 && r._2 <= 100.0)
  }

  test("A13: mean-of-means differs from pooled mean (two-level semantics)") {
    val ev = Seq(
      (1L, java.sql.Timestamp.valueOf("2025-11-28 19:24:41"), 1L, "view", 10.0),
      (2L, java.sql.Timestamp.valueOf("2025-11-28 19:24:42"), 1L, "view", 10.0),
      (3L, java.sql.Timestamp.valueOf("2025-11-28 19:24:43"), 1L, "view", 10.0),
      (4L, java.sql.Timestamp.valueOf("2025-11-28 19:24:44"), 2L, "view", 40.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    import graft.functions.Parity.exactAvg
    val mom = ev.groupBy("event_type", "user_id").agg(exactAvg(col("value")).as("m"))
      .groupBy("event_type").agg(exactAvg(col("m")).as("mom"))
      .select("mom").as[Double].head()
    assert(mom === 25.0) // pooled mean would be 17.5
  }

  test("a21: perfectly tracking cpu/mem gives corr 1, anti-tracking -1") {
    import spark.implicits._
    def lines(rows: (Long, Long, Long)*) = rows.map { case (id, c, m) =>
      (id, s"[worker0-view] CPU: $c% | MEM: $m%")
    }.toDF("event_id", "line")
    val up = LogAnalytics.cpuMemCorr(lines((1, 10, 20), (2, 20, 40), (3, 30, 60)))
      .collect().head
    assert(up.getAs[Long]("n") == 3L)
    assert(up.getAs[Double]("cpu_mem_corr") == 1.0)
    val down = LogAnalytics.cpuMemCorr(lines((1, 10, 60), (2, 20, 40), (3, 30, 20)))
      .collect().head
    assert(down.getAs[Double]("cpu_mem_corr") == -1.0)
    // constant memory -> undefined correlation, guarded null
    val flat = LogAnalytics.cpuMemCorr(lines((1, 10, 50), (2, 20, 50)))
      .collect().head
    assert(flat.isNullAt(2))
  }
}
