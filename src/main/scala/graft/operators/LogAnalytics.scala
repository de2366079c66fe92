package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.{Q, Tables}
import graft.functions.Parity.{exactAvg, pround}

/** Log-analytics operators (SURVEY.md §2.C/§2.D, A1-A17 + C1-C2).
  *
  * The reference's pipeline (`analyze/common_utils.py`) parses monitor and
  * job logs, sessionizes on delimiter lines, detects stage boundaries with
  * conditional first-match rules, and rolls up with two-level means. Here
  * each operator is a declarative DataFrame transform over the `events`
  * testdata table: log lines are *synthesized* from table columns (so the
  * DuckDB oracle can replay the exact same bytes), then parsed back with
  * the same regex machinery the real ingestion path uses (LogParsers).
  *
  * Scale notes: every grouping is keyed on (user_id) or (event_type) — a
  * plain hash shuffle that partitions cleanly at 100 TB; windows partition
  * by the same keys (no global windows except tiny top-k outputs); the
  * only broadcast is the 5-row per-type limit table in a17.
  */
object LogAnalytics {

  // Numeric parity helpers come from graft.functions.Parity (file-level
  // import): exactAvg / pround keep doubles bit-identical vs DuckDB.

  /** A1 analog input: a monitor-format line per event, built from integer
    * and string columns only (no double→string casts — their formatting
    * differs across engines). Reference format `monitor_real.sh:59-62`. */
  def monitorLine(df: DataFrame): DataFrame =
    df.select(
      col("event_id"),
      concat(
        lit("[worker"), col("user_id") % 3, lit("-"), col("event_type"),
        lit("] CPU: "), floor(col("value") * 10).cast("long"),
        lit("% | MEM: "), col("user_id") % 100, lit("%")).as("line"))

  /** Non-matching regexp_extract yields '' — under ANSI mode casting ''
    * throws, so null it first (headers/delimiter lines must parse to
    * null, not kill the job; reference skips them at common_utils.py:35). */
  private def numOrNull(c: Column, t: String): Column =
    when(c === "", lit(null)).otherwise(c).cast(t)

  /** A1: regex record parse of monitor lines (common_utils.py:27-44). */
  def parseMonitorLine(lines: DataFrame): DataFrame = {
    val pat = "\\[(\\w+-\\w+)\\] CPU: (\\d+)% \\| MEM: (\\d+)%"
    lines.select(
      col("event_id"),
      regexp_extract(col("line"), pat, 1).as("node"),
      numOrNull(regexp_extract(col("line"), pat, 2), "long").as("cpu"),
      numOrNull(regexp_extract(col("line"), pat, 3), "long").as("mem"))
  }

  /** A3 analog input: a Hadoop job progress line per event
    * (common_utils.py:59-62 format). */
  def progressLine(df: DataFrame): DataFrame =
    df.select(
      col("event_id"),
      concat(
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss"), lit(","),
        lpad((col("event_id") % 1000).cast("string"), 3, "0"),
        lit(" INFO mapreduce.Job:  map "), col("user_id") % 101,
        lit("% reduce "), col("event_id") % 101, lit("%")).as("line"))

  /** A3: progress-event parse — regexp_extract + to_timestamp. */
  def parseProgressLine(lines: DataFrame): DataFrame = {
    val pat = "(\\d{4}-\\d{2}-\\d{2} \\d{2}:\\d{2}:\\d{2}),\\d+ INFO mapreduce.Job:  map (\\d+)% reduce (\\d+)%"
    val tsStr = regexp_extract(col("line"), pat, 1)
    lines.select(
      col("event_id"),
      when(tsStr === "", lit(null)).otherwise(
        to_timestamp(tsStr, "yyyy-MM-dd HH:mm:ss")).as("pts"),
      numOrNull(regexp_extract(col("line"), pat, 2), "int").as("map_pct"),
      numOrNull(regexp_extract(col("line"), pat, 3), "int").as("red_pct"))
  }

  /** A10 analog input: run-directory paths like the reference's
    * `MapReduceLog/_100mb_slowstart_0.5/<ts>/monitor.log` tree. */
  def runPath(df: DataFrame): DataFrame =
    df.select(
      col("event_id"),
      concat(
        lit("MapReduceLog/_"), (col("user_id") % 5) + 1,
        element_at(
          map(lit("click"), lit("mb"), lit("view"), lit("MB"),
            lit("purchase"), lit("G"), lit("signup"), lit("gb"),
            lit("error"), lit("GB")),
          col("event_type")),
        lit("_slowstart_0."), (col("event_id") % 9) + 1,
        lit("/20251128_192422/monitor.log")).as("path"))

  /** A10: path-dimension extraction (common_utils.py:180-187; dataset
    * upper-cased at :186). */
  def parseRunPath(paths: DataFrame): DataFrame = {
    val pat = "_?(\\d+(?:mb|MB|gb|GB|M|G)?)_slowstart_([\\d.]+)"
    paths.select(
      col("event_id"),
      upper(regexp_extract(col("path"), pat, 1)).as("dataset"),
      numOrNull(regexp_extract(col("path"), pat, 2), "double").as("slowstart"))
  }

  /** A16 core: per-group outlier-robust limit — if max > 2nd-max × 1.1,
    * use the 2nd-max (analyze_cpu_slowstart.py:22-38). Shared by the
    * a16 report and the a17 truncation filter so the rule can't drift
    * between them. Returns (event_type, axis_limit) unrounded. */
  def axisLimits(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("event_type")
      .orderBy(col("value").desc, col("event_id").desc)
    events.select(col("event_type"), col("value"),
      row_number().over(w).as("rn"))
      .where(col("rn") <= 2)
      .groupBy("event_type")
      .agg(max(when(col("rn") === 1, col("value"))).as("mx"),
        max(when(col("rn") === 2, col("value"))).as("second"))
      .select(col("event_type"),
        when(col("mx") > col("second") * 1.1, col("second"))
          .otherwise(col("mx")).as("axis_limit"))
  }

  /** A5: first-match stage detection as conditional aggregates per run
    * (= user_id). Mirrors common_utils.py:84-110: t_map_done = first
    * map=100 event; t_shuf_start = first red>0; t_shuf_end = first
    * map=100 ∧ red≥90 (the reference's red≥90 heuristic, copied as-is —
    * SURVEY §7 risk 4). Here: purchase ≈ map-done, value>5 ≈ red>0,
    * purchase ∧ value≥9 ≈ the heuristic. */
  def stageDetect(events: DataFrame): DataFrame =
    events.groupBy("user_id").agg(
      min(col("ts")).as("t0"),
      max(col("ts")).as("t_end"),
      min(when(col("event_type") === "purchase", col("ts"))).as("t_map_done"),
      min(when(col("value") > 5, col("ts"))).as("t_shuf_start"),
      min(when(col("event_type") === "purchase" && col("value") >= 9,
        col("ts"))).as("t_shuf_end"))

  /** A6: n-th-from-end positional fallback (common_utils.py:112-119):
    * 2nd-to-last event per run, or the last when fewer than 2 exist. */
  def nthFromEnd(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts").desc, col("event_id").desc)
    events.select(col("user_id"), col("ts"), row_number().over(w).as("rn"))
      .where(col("rn") <= 2)
      .groupBy("user_id")
      .agg(coalesce(
        max(when(col("rn") === 2, col("ts"))),
        max(when(col("rn") === 1, col("ts")))).as("fallback_ts"))
  }

  /** A7: stage-duration arithmetic (common_utils.py:122-135), seconds as
    * exact long diffs of floored epochs, with the degenerate zero-shuffle
    * path (:131-133) preserved. A6 fallback substitutes a missing
    * shuffle-end.
    *
    * Single-shuffle plan: the fallback needs per-run event order, so we
    * rank with a window partitioned by user_id and aggregate on the SAME
    * key — Catalyst reuses the window's hash partitioning for the
    * groupBy, so stage detection + fallback + durations cost one exchange
    * (the previous two-aggregation + join shape cost three). */
  def stageDurations(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts").desc, col("event_id").desc)
    val st = events
      .withColumn("rn_desc", row_number().over(w))
      .groupBy("user_id").agg(
        min(col("ts")).as("t0"),
        max(col("ts")).as("t_end"),
        min(when(col("event_type") === "purchase", col("ts"))).as("t_map_done"),
        min(when(col("value") > 5, col("ts"))).as("t_shuf_start"),
        min(when(col("event_type") === "purchase" && col("value") >= 9,
          col("ts"))).as("t_shuf_end"),
        coalesce(
          max(when(col("rn_desc") === 2, col("ts"))),
          max(when(col("rn_desc") === 1, col("ts")))).as("fallback_ts"))
    st.select(
      col("user_id"),
      (unix_timestamp(col("t_end")) - unix_timestamp(col("t0")))
        .cast("double").as("total_s"),
      when(col("t_map_done").isNull, lit(0.0))
        .otherwise((unix_timestamp(col("t_map_done")) -
          unix_timestamp(col("t0"))).cast("double")).as("map_s"),
      when(col("t_shuf_start").isNull, lit(0.0))
        .otherwise((unix_timestamp(coalesce(col("t_shuf_end"), col("fallback_ts"))) -
          unix_timestamp(col("t_shuf_start"))).cast("double")).as("shuffle_s"),
      when(col("t_shuf_end").isNull, lit(0.0))
        .otherwise((unix_timestamp(col("t_end")) -
          unix_timestamp(col("t_shuf_end"))).cast("double")).as("reduce_s"))
  }

  /** A8: interval-overlap ratio (common_utils.py:137-149): overlap of
    * [t0, t_map_done] with [t_shuf_start, t_shuf_end], as % of shuffle
    * duration, clamped at 0, 0 when shuffle is degenerate. */
  def overlapRatio(events: DataFrame): DataFrame =
    stageDetect(events).select(
      col("user_id"),
      when(col("t_map_done").isNull || col("t_shuf_start").isNull ||
        col("t_shuf_end").isNull ||
        unix_timestamp(col("t_shuf_end")) === unix_timestamp(col("t_shuf_start")),
        lit(0.0))
        .otherwise(pround(
          greatest(lit(0L),
            least(unix_timestamp(col("t_map_done")), unix_timestamp(col("t_shuf_end"))) -
              greatest(unix_timestamp(col("t0")), unix_timestamp(col("t_shuf_start"))))
            .cast("double") * 100.0 /
            (unix_timestamp(col("t_shuf_end")) - unix_timestamp(col("t_shuf_start")))
              .cast("double"), 2))
        .as("overlap_pct"))

  /** a21: per-node CPU–MEM correlation over the parsed monitor stream —
    * the capacity-planning question ("is memory pressure tracking CPU
    * load, or leaking independently?") asked of the same samples
    * A11-A14 aggregate. Bridges the log-analytics family to the x-series
    * moment machinery: one combinable integer-moment pass per node over
    * a1's parsed (node, cpu, mem) records, Pearson through the shared
    * x30 tree. Degenerate nodes (constant CPU or MEM) are guarded null,
    * and node cardinality bounds the output however long the logs run. */
  def cpuMemCorr(lines: DataFrame): DataFrame = {
    val dec = DecimalType(38, 0)
    parseMonitorLine(lines)
      .where(col("node") =!= "")
      .groupBy("node")
      .agg(count(lit(1)).as("n"),
        sum(col("cpu").cast(dec)).as("sx"), sum(col("mem").cast(dec)).as("sy"),
        sum((col("cpu") * col("cpu")).cast(dec)).as("sxx"),
        sum((col("cpu") * col("mem")).cast(dec)).as("sxy"),
        sum((col("mem") * col("mem")).cast(dec)).as("syy"))
      .select(col("node"), col("n"),
        pround(expr(Stats.acf1Expr), 9).as("cpu_mem_corr"))
      .orderBy("node")
  }

  // a22's shared IEEE trees over exact (n, Σx, Σx²) moment rows —
  // mirrored textually in the oracle; zero/negative mean -> null CV.
  private[graft] val cvMeanExpr =
    "(cast(sx as double) / cast(n as double))"
  private[graft] val cvExpr =
    s"(case when $cvMeanExpr <= 0.0 then cast(null as double) " +
      s"else sqrt((cast(sxx as double) / cast(n as double)) " +
      s"- ($cvMeanExpr) * ($cvMeanExpr)) / ($cvMeanExpr) end)"
}

object LogAnalyticsQueries {
  import LogAnalytics._
  private def ev(s: SparkSession, d: String) = Tables.events(s, d)

  val qs: Seq[Q] = Seq(
    Q("a1_monitor_parse",
      (s, d) => parseMonitorLine(monitorLine(ev(s, d))).orderBy("event_id"),
      Some("""WITH lines AS (
             |  SELECT event_id,
             |         '[worker' || (user_id % 3) || '-' || event_type ||
             |         '] CPU: ' || CAST(floor(value * 10) AS BIGINT) ||
             |         '% | MEM: ' || (user_id % 100) || '%' AS line
             |  FROM events)
             |SELECT event_id,
             |       regexp_extract(line, '\[(\w+-\w+)\] CPU: (\d+)% \| MEM: (\d+)%', 1) AS node,
             |       CAST(regexp_extract(line, '\[(\w+-\w+)\] CPU: (\d+)% \| MEM: (\d+)%', 2) AS BIGINT) AS cpu,
             |       CAST(regexp_extract(line, '\[(\w+-\w+)\] CPU: (\d+)% \| MEM: (\d+)%', 3) AS BIGINT) AS mem
             |FROM lines ORDER BY event_id""".stripMargin),
      doc = "A1 regex monitor-line parse (common_utils.py:27-44)"),

    Q("a2_sessionize",
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ev(s, d).select(col("event_id"), col("user_id"),
          sum(when(col("event_type") === "error", 1).otherwise(0)).over(w)
            .as("time_step")).orderBy("event_id")
      },
      Some("""SELECT event_id, user_id,
             |       CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
             |         OVER (PARTITION BY user_id ORDER BY ts, event_id
             |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS time_step
             |FROM events ORDER BY event_id""".stripMargin),
      doc = "A2 delimiter sessionization: running sum over per-run window (common_utils.py:24-33)"),

    Q("a2b_gap_sessions",
      (s, d) => {
        val wOrd = Window.partitionBy("user_id").orderBy("ts", "event_id")
        val wRun = Window.partitionBy("user_id").orderBy("ts", "event_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ev(s, d).select(col("event_id"), col("user_id"), col("ts"),
          (unix_timestamp(col("ts")) -
            lag(unix_timestamp(col("ts")), 1).over(wOrd)).as("gap_s"))
          .select(col("event_id"), col("user_id"),
            sum(when(col("gap_s").isNull || col("gap_s") > 1800, 1)
              .otherwise(0)).over(wRun).as("session_id"))
          .orderBy("event_id")
      },
      Some("""WITH g AS (
             |  SELECT event_id, user_id, ts,
             |         CAST(floor(epoch(ts)) AS BIGINT) -
             |           lag(CAST(floor(epoch(ts)) AS BIGINT), 1)
             |             OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_s
             |  FROM events)
             |SELECT event_id, user_id,
             |       CAST(sum(CASE WHEN gap_s IS NULL OR gap_s > 1800 THEN 1 ELSE 0 END)
             |         OVER (PARTITION BY user_id ORDER BY ts, event_id
             |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
             |FROM g ORDER BY event_id""".stripMargin),
      doc = "gap-based sessionization (30-min inactivity): lag + running sum (batch analog of session_window)"),

    Q("a3_progress_parse",
      (s, d) => parseProgressLine(progressLine(ev(s, d))).orderBy("event_id"),
      Some("""WITH lines AS (
             |  SELECT event_id,
             |         strftime(ts, '%Y-%m-%d %H:%M:%S') || ',' ||
             |         lpad(CAST(event_id % 1000 AS VARCHAR), 3, '0') ||
             |         ' INFO mapreduce.Job:  map ' || (user_id % 101) ||
             |         '% reduce ' || (event_id % 101) || '%' AS line
             |  FROM events)
             |SELECT event_id,
             |       strptime(regexp_extract(line, '(\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2}),\d+ INFO mapreduce.Job:  map (\d+)% reduce (\d+)%', 1), '%Y-%m-%d %H:%M:%S') AS pts,
             |       CAST(regexp_extract(line, '(\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2}),\d+ INFO mapreduce.Job:  map (\d+)% reduce (\d+)%', 2) AS INT) AS map_pct,
             |       CAST(regexp_extract(line, '(\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2}),\d+ INFO mapreduce.Job:  map (\d+)% reduce (\d+)%', 3) AS INT) AS red_pct
             |FROM lines ORDER BY event_id""".stripMargin),
      doc = "A3 progress-event parse: regexp_extract + to_timestamp (common_utils.py:59-64)"),

    Q("a4_event_order",
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        ev(s, d).select(col("event_id"), col("user_id"),
          row_number().over(w).as("seq")).orderBy("event_id")
      },
      Some("""SELECT event_id, user_id,
             |       row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS seq
             |FROM events ORDER BY event_id""".stripMargin),
      doc = "A4 event-time ordering (common_utils.py:77)"),

    Q("a5_stage_detect",
      (s, d) => stageDetect(ev(s, d)).orderBy("user_id"),
      Some("""SELECT user_id, min(ts) AS t0, max(ts) AS t_end,
             |       min(CASE WHEN event_type = 'purchase' THEN ts END) AS t_map_done,
             |       min(CASE WHEN value > 5 THEN ts END) AS t_shuf_start,
             |       min(CASE WHEN event_type = 'purchase' AND value >= 9 THEN ts END) AS t_shuf_end
             |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin),
      doc = "A5 first-match stage detection via conditional aggregates (common_utils.py:84-110)"),

    Q("a6_nth_from_end",
      (s, d) => nthFromEnd(ev(s, d)).orderBy("user_id"),
      Some("""WITH r AS (
             |  SELECT user_id, ts,
             |         row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
             |  FROM events)
             |SELECT user_id,
             |       coalesce(max(CASE WHEN rn = 2 THEN ts END),
             |                max(CASE WHEN rn = 1 THEN ts END)) AS fallback_ts
             |FROM r WHERE rn <= 2 GROUP BY user_id ORDER BY user_id""".stripMargin),
      doc = "A6 2nd-from-end positional fallback (common_utils.py:112-119)"),

    Q("a7_durations",
      (s, d) => stageDurations(ev(s, d)).orderBy("user_id"),
      Some("""WITH st AS (
             |  SELECT user_id, min(ts) AS t0, max(ts) AS t_end,
             |         min(CASE WHEN event_type = 'purchase' THEN ts END) AS t_map_done,
             |         min(CASE WHEN value > 5 THEN ts END) AS t_shuf_start,
             |         min(CASE WHEN event_type = 'purchase' AND value >= 9 THEN ts END) AS t_shuf_end
             |  FROM events GROUP BY user_id),
             |r AS (
             |  SELECT user_id, ts,
             |         row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
             |  FROM events),
             |fb AS (
             |  SELECT user_id,
             |         coalesce(max(CASE WHEN rn = 2 THEN ts END),
             |                  max(CASE WHEN rn = 1 THEN ts END)) AS fallback_ts
             |  FROM r WHERE rn <= 2 GROUP BY user_id)
             |SELECT st.user_id,
             |       CAST(CAST(floor(epoch(t_end)) AS BIGINT) - CAST(floor(epoch(t0)) AS BIGINT) AS DOUBLE) AS total_s,
             |       CASE WHEN t_map_done IS NULL THEN 0.0
             |            ELSE CAST(CAST(floor(epoch(t_map_done)) AS BIGINT) - CAST(floor(epoch(t0)) AS BIGINT) AS DOUBLE) END AS map_s,
             |       CASE WHEN t_shuf_start IS NULL THEN 0.0
             |            ELSE CAST(CAST(floor(epoch(coalesce(t_shuf_end, fallback_ts))) AS BIGINT) - CAST(floor(epoch(t_shuf_start)) AS BIGINT) AS DOUBLE) END AS shuffle_s,
             |       CASE WHEN t_shuf_end IS NULL THEN 0.0
             |            ELSE CAST(CAST(floor(epoch(t_end)) AS BIGINT) - CAST(floor(epoch(t_shuf_end)) AS BIGINT) AS DOUBLE) END AS reduce_s
             |FROM st JOIN fb ON st.user_id = fb.user_id
             |ORDER BY st.user_id""".stripMargin),
      doc = "A7 stage-duration arithmetic with degenerate paths (common_utils.py:122-135)"),

    Q("a8_overlap",
      (s, d) => overlapRatio(ev(s, d)).orderBy("user_id"),
      Some("""WITH st AS (
             |  SELECT user_id,
             |         CAST(floor(epoch(min(ts))) AS BIGINT) AS t0,
             |         CAST(floor(epoch(min(CASE WHEN event_type = 'purchase' THEN ts END))) AS BIGINT) AS t_map_done,
             |         CAST(floor(epoch(min(CASE WHEN value > 5 THEN ts END))) AS BIGINT) AS t_shuf_start,
             |         CAST(floor(epoch(min(CASE WHEN event_type = 'purchase' AND value >= 9 THEN ts END))) AS BIGINT) AS t_shuf_end
             |  FROM events GROUP BY user_id)
             |SELECT user_id,
             |       CASE WHEN t_map_done IS NULL OR t_shuf_start IS NULL
             |              OR t_shuf_end IS NULL OR t_shuf_end = t_shuf_start THEN 0.0
             |            ELSE floor(CAST(greatest(0, least(t_map_done, t_shuf_end) -
             |                                        greatest(t0, t_shuf_start)) AS DOUBLE)
             |                       * 100.0 / CAST(t_shuf_end - t_shuf_start AS DOUBLE) * 100.0 + 0.5) / 100.0
             |       END AS overlap_pct
             |FROM st ORDER BY user_id""".stripMargin),
      doc = "A8 interval-overlap ratio, clamped (common_utils.py:137-149)"),

    Q("a10_path_dims",
      (s, d) => parseRunPath(runPath(ev(s, d))).orderBy("event_id"),
      Some("""WITH p AS (
             |  SELECT event_id,
             |         'MapReduceLog/_' || ((user_id % 5) + 1) ||
             |         CASE event_type WHEN 'click' THEN 'mb' WHEN 'view' THEN 'MB'
             |              WHEN 'purchase' THEN 'G' WHEN 'signup' THEN 'gb'
             |              ELSE 'GB' END ||
             |         '_slowstart_0.' || ((event_id % 9) + 1) ||
             |         '/20251128_192422/monitor.log' AS path
             |  FROM events)
             |SELECT event_id,
             |       upper(regexp_extract(path, '_?(\d+(?:mb|MB|gb|GB|M|G)?)_slowstart_([\d.]+)', 1)) AS dataset,
             |       CAST(regexp_extract(path, '_?(\d+(?:mb|MB|gb|GB|M|G)?)_slowstart_([\d.]+)', 2) AS DOUBLE) AS slowstart
             |FROM p ORDER BY event_id""".stripMargin),
      doc = "A10 run scan path-dimension extraction (common_utils.py:159-231, regex :180)"),

    Q("a11_normalize",
      (s, d) => {
        val w = Window.partitionBy("user_id")
        ev(s, d).select(col("event_id"),
          (col("value") - min(col("value")).over(w)).as("value_norm"))
          .orderBy("event_id")
      },
      Some("""SELECT event_id,
             |       value - min(value) OVER (PARTITION BY user_id) AS value_norm
             |FROM events ORDER BY event_id""".stripMargin),
      doc = "A11 per-run min-normalization (common_utils.py:213-215)"),

    Q("a12_per_step_mean",
      (s, d) => ev(s, d).groupBy("event_type", "user_id")
        .agg(pround(exactAvg(col("value")), 4).as("mean_value"))
        .orderBy("event_type", "user_id"),
      Some("""SELECT event_type, user_id,
             |       floor(CAST(sum(CAST(floor(value * 1000000.0 + 0.5) / 1000000.0 AS DECIMAL(28,6))) AS DOUBLE)
             |             / count(*) * 10000.0 + 0.5) / 10000.0 AS mean_value
             |FROM events GROUP BY event_type, user_id
             |ORDER BY event_type, user_id""".stripMargin),
      doc = "A12 per-step cross-node mean (common_utils.py:265,302); decimal-exact"),

    Q("a13_mean_of_means",
      (s, d) => ev(s, d).groupBy("event_type", "user_id")
        .agg(exactAvg(col("value")).as("inner_mean"))
        .groupBy("event_type")
        .agg(pround(exactAvg(col("inner_mean")), 4).as("mean_of_means"))
        .orderBy("event_type"),
      Some("""WITH inner_m AS (
             |  SELECT event_type, user_id,
             |         CAST(sum(CAST(floor(value * 1000000.0 + 0.5) / 1000000.0 AS DECIMAL(28,6))) AS DOUBLE)
             |           / count(*) AS inner_mean
             |  FROM events GROUP BY event_type, user_id)
             |SELECT event_type,
             |       floor(CAST(sum(CAST(floor(inner_mean * 1000000.0 + 0.5) / 1000000.0 AS DECIMAL(28,6))) AS DOUBLE)
             |             / count(*) * 10000.0 + 0.5) / 10000.0 AS mean_of_means
             |FROM inner_m GROUP BY event_type ORDER BY event_type""".stripMargin),
      doc = "A13 cross-run mean-of-means — two-level agg, NOT pooled (common_utils.py:245-344)"),

    Q("a14_stage_means",
      (s, d) => stageDurations(ev(s, d))
        .select(col("user_id") % 10 as "cohort", col("total_s"), col("map_s"))
        .groupBy("cohort")
        .agg(pround(exactAvg(col("total_s")), 2).as("avg_total_s"),
          pround(exactAvg(col("map_s")), 2).as("avg_map_s"))
        .orderBy("cohort"),
      Some("""WITH st AS (
             |  SELECT user_id, min(ts) AS t0, max(ts) AS t_end,
             |         min(CASE WHEN event_type = 'purchase' THEN ts END) AS t_map_done
             |  FROM events GROUP BY user_id),
             |dur AS (
             |  SELECT user_id % 10 AS cohort,
             |         CAST(CAST(floor(epoch(t_end)) AS BIGINT) - CAST(floor(epoch(t0)) AS BIGINT) AS DOUBLE) AS total_s,
             |         CASE WHEN t_map_done IS NULL THEN 0.0
             |              ELSE CAST(CAST(floor(epoch(t_map_done)) AS BIGINT) - CAST(floor(epoch(t0)) AS BIGINT) AS DOUBLE) END AS map_s
             |  FROM st)
             |SELECT cohort,
             |       floor(CAST(sum(CAST(floor(total_s * 1000000.0 + 0.5) / 1000000.0 AS DECIMAL(28,6))) AS DOUBLE) / count(*) * 100.0 + 0.5) / 100.0 AS avg_total_s,
             |       floor(CAST(sum(CAST(floor(map_s * 1000000.0 + 0.5) / 1000000.0 AS DECIMAL(28,6))) AS DOUBLE) / count(*) * 100.0 + 0.5) / 100.0 AS avg_map_s
             |FROM dur GROUP BY cohort ORDER BY cohort""".stripMargin),
      doc = "A14 cross-run stage-metric means (common_utils.py:322-344)"),

    Q("a22_stage_cv",
      // Dispersion companion to a14's means: per cohort, the coefficient
      // of variation of run duration — the "is this stage STABLE across
      // runs?" read the reference's mean-only tables cannot give. The
      // run durations are integer seconds, so n/Σx/Σx² are exact longs
      // from one combinable pass over a7's per-run reduction; CV is one
      // shared IEEE tree over the 10 cohort rows (zero-mean guard).
      (s, d) => stageDurations(ev(s, d))
        .select((col("user_id") % 10).as("cohort"),
          col("total_s").cast("long").as("x"))
        .groupBy("cohort")
        .agg(count(lit(1)).as("n"), sum("x").as("sx"),
          sum(col("x") * col("x")).as("sxx"))
        .select(col("cohort"), col("n"),
          pround(expr(cvMeanExpr), 6).as("mean_total_s"),
          pround(expr(cvExpr), 6).as("cv_total_s"))
        .orderBy("cohort"),
      Some(s"""WITH st AS (
              |  SELECT user_id, min(ts) AS t0, max(ts) AS t_end
              |  FROM events GROUP BY user_id),
              |d2 AS (
              |  SELECT user_id % 10 AS cohort,
              |         CAST(floor(epoch(t_end)) AS BIGINT)
              |           - CAST(floor(epoch(t0)) AS BIGINT) AS x
              |  FROM st),
              |mo AS (
              |  SELECT cohort, CAST(count(*) AS BIGINT) AS n,
              |         CAST(sum(x) AS BIGINT) AS sx,
              |         CAST(sum(x * x) AS BIGINT) AS sxx
              |  FROM d2 GROUP BY 1)
              |SELECT cohort, n,
              |       floor(($cvMeanExpr) * 1000000.0 + 0.5) / 1000000.0
              |         AS mean_total_s,
              |       floor(($cvExpr) * 1000000.0 + 0.5) / 1000000.0
              |         AS cv_total_s
              |FROM mo ORDER BY cohort""".stripMargin),
      doc = "cross-run stage-duration dispersion (CV per cohort): exact " +
        "integer moments in one combinable pass over a7's per-run " +
        "reduction, shared IEEE tree, zero-mean null guard"),

    Q("a15_natural_sort",
      // distinct FIRST (25 combos), then synthesize+parse — same output
      // as synthesizing 100k paths, without the wasted projection work
      (s, d) => parseRunPath(runPath(
        ev(s, d).select((col("user_id") % 5).as("m"), col("event_type"))
          .distinct()
          .select(lit(0L).as("event_id"), col("m").as("user_id"),
            col("event_type"))))
        .select(col("dataset")).distinct()
        .select(col("dataset"),
          (regexp_extract(col("dataset"), "(\\d+)", 1).cast("long") *
            when(col("dataset").contains("G"), 1000L).otherwise(1L))
            .as("sort_key"))
        .orderBy("sort_key", "dataset"),
      Some("""WITH p AS (
             |  SELECT DISTINCT
             |         upper(((user_id % 5) + 1) ||
             |         CASE event_type WHEN 'click' THEN 'mb' WHEN 'view' THEN 'MB'
             |              WHEN 'purchase' THEN 'G' WHEN 'signup' THEN 'gb'
             |              ELSE 'GB' END) AS dataset
             |  FROM events)
             |SELECT dataset,
             |       CAST(regexp_extract(dataset, '(\d+)', 1) AS BIGINT) *
             |         (CASE WHEN contains(dataset, 'G') THEN 1000 ELSE 1 END) AS sort_key
             |FROM p ORDER BY sort_key, dataset""".stripMargin),
      doc = "A15 unit-aware natural sort key (common_utils.py:347-353)"),

    Q("a16_outlier_limit",
      (s, d) => axisLimits(ev(s, d))
        .select(col("event_type"), pround(col("axis_limit"), 2).as("axis_limit"))
        .orderBy("event_type"),
      Some("""WITH r AS (
             |  SELECT event_type, value,
             |         row_number() OVER (PARTITION BY event_type ORDER BY value DESC, event_id DESC) AS rn
             |  FROM events),
             |t AS (
             |  SELECT event_type,
             |         max(CASE WHEN rn = 1 THEN value END) AS mx,
             |         max(CASE WHEN rn = 2 THEN value END) AS second
             |  FROM r WHERE rn <= 2 GROUP BY event_type)
             |SELECT event_type,
             |       floor((CASE WHEN mx > second * 1.1 THEN second ELSE mx END) * 100.0 + 0.5) / 100.0 AS axis_limit
             |FROM t ORDER BY event_type""".stripMargin),
      doc = "A16 outlier-robust axis limit: 2nd-max×1.1 rule (analyze_cpu_slowstart.py:22-38)"),

    Q("a17_truncate",
      (s, d) => {
        ev(s, d).join(broadcast(axisLimits(ev(s, d))), "event_type")
          .where(col("value") <= col("axis_limit"))
          .groupBy("event_type").agg(count(lit(1)).as("kept"))
          .orderBy("event_type")
      },
      Some("""WITH r AS (
             |  SELECT event_type, value,
             |         row_number() OVER (PARTITION BY event_type ORDER BY value DESC, event_id DESC) AS rn
             |  FROM events),
             |lim AS (
             |  SELECT event_type,
             |         CASE WHEN max(CASE WHEN rn = 1 THEN value END) >
             |                   max(CASE WHEN rn = 2 THEN value END) * 1.1
             |              THEN max(CASE WHEN rn = 2 THEN value END)
             |              ELSE max(CASE WHEN rn = 1 THEN value END) END AS axis_limit
             |  FROM r WHERE rn <= 2 GROUP BY event_type)
             |SELECT e.event_type, count(*) AS kept
             |FROM events e JOIN lim ON e.event_type = lim.event_type
             |WHERE e.value <= lim.axis_limit
             |GROUP BY e.event_type ORDER BY e.event_type""".stripMargin),
      doc = "A17 truncation filter via broadcast of tiny per-group limits (analyze_cpu_slowstart.py:75-77)"),

    Q("c1_lag_delta",
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        ev(s, d).select(col("event_id"),
          (col("value") - lag(col("value"), 1).over(w)).as("delta"),
          (unix_timestamp(col("ts")) - lag(unix_timestamp(col("ts")), 1).over(w))
            .as("dt_s"))
          .select(col("event_id"), col("delta"),
            when(col("dt_s") > 0, col("delta") / col("dt_s").cast("double"))
              .as("rate_per_s"))
          .orderBy("event_id")
      },
      Some("""WITH l AS (
             |  SELECT event_id,
             |         value - lag(value, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS delta,
             |         CAST(floor(epoch(ts)) AS BIGINT) -
             |           lag(CAST(floor(epoch(ts)) AS BIGINT), 1)
             |             OVER (PARTITION BY user_id ORDER BY ts, event_id) AS dt_s
             |  FROM events)
             |SELECT event_id, delta,
             |       CASE WHEN dt_s > 0 THEN delta / CAST(dt_s AS DOUBLE) END AS rate_per_s
             |FROM l ORDER BY event_id""".stripMargin),
      doc = "C1 two-sample CPU delta: lag() window derivative (monitor_real.sh:43-54)"),

    Q("c2_mem_pct",
      (s, d) => ev(s, d).select(col("event_id"),
        floor(lit(100.0) * col("value") / (col("value") + (col("user_id") + 1).cast("double")))
          .cast("long").as("mem_pct"))
        .orderBy("event_id"),
      Some("""SELECT event_id,
             |       CAST(floor(100.0 * value / (value + CAST(user_id + 1 AS DOUBLE))) AS BIGINT) AS mem_pct
             |FROM events ORDER BY event_id""".stripMargin),
      doc = "C2 MEM% projection, integer-floored (monitor_real.sh:22-28)"),

    Q("a21_cpu_mem_corr",
      (s, d) => cpuMemCorr(monitorLine(ev(s, d))),
      Some(s"""WITH lines AS (
              |  SELECT event_id,
              |         '[worker' || (user_id % 3) || '-' || event_type ||
              |         '] CPU: ' || CAST(floor(value * 10) AS BIGINT) ||
              |         '% | MEM: ' || (user_id % 100) || '%' AS line
              |  FROM events),
              |p AS (
              |  SELECT regexp_extract(line, '\\[(\\w+-\\w+)\\] CPU: (\\d+)% \\| MEM: (\\d+)%', 1) AS node,
              |         CAST(regexp_extract(line, '\\[(\\w+-\\w+)\\] CPU: (\\d+)% \\| MEM: (\\d+)%', 2) AS BIGINT) AS cpu,
              |         CAST(regexp_extract(line, '\\[(\\w+-\\w+)\\] CPU: (\\d+)% \\| MEM: (\\d+)%', 3) AS BIGINT) AS mem
              |  FROM lines),
              |mo AS (
              |  SELECT node, count(*) AS n,
              |         sum(CAST(cpu AS HUGEINT)) AS sx, sum(CAST(mem AS HUGEINT)) AS sy,
              |         sum(CAST(cpu AS HUGEINT) * cpu) AS sxx,
              |         sum(CAST(cpu AS HUGEINT) * mem) AS sxy,
              |         sum(CAST(mem AS HUGEINT) * mem) AS syy
              |  FROM p WHERE node <> '' GROUP BY 1)
              |SELECT node, n,
              |       floor((${Stats.acf1Expr})
              |             * 1000000000.0 + 0.5) / 1000000000.0 AS cpu_mem_corr
              |FROM mo ORDER BY node""".stripMargin),
      doc = "per-node CPU-MEM Pearson correlation over the a1 monitor " +
        "stream: one combinable integer-moment pass per node, shared x30 " +
        "tree, output bounded by node cardinality"),
  )
}
