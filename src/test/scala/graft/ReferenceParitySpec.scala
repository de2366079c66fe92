package graft

import org.apache.spark.sql.functions._
import graft.sources.LogFiles
import graft.plans.StageAggregator
import graft.plans.StageAggregator.ProgressEvent

/** End-to-end golden parity with the reference's own committed artifacts:
  * its job logs (`MapReduceLog/`) flow through OUR ingestion + stage
  * analytics, and the per-(dataset, slowstart) means must equal the rows
  * the reference committed in `Analysis_Results/result_raw.csv`.
  *
  * Scope (SURVEY §5): the 100MB and 500MB configs are fully reproducible
  * from the committed nested-layout logs — all 8 rows × 4 stage metrics +
  * overlap verified here. The CSV's Avg_CPU column is NOT derivable from
  * the committed monitor logs (no aggregation of them — pooled, per-step,
  * or per-node means — yields those values, and README §4 reports a third
  * set; the column came from a monitoring session that was never
  * committed), so CPU parity is asserted structurally instead.
  */
class ReferenceParitySpec extends SparkSpec {
  import spark.implicits._

  private val RefLogs = "/root/reference/MapReduceLog"

  // result_raw.csv rows (Total, Map, Shuffle, Reduce, Overlap), 2-dp
  private val expected = Map(
    ("100MB", 0.2) -> ((134.33, 131.00, 82.33, 0.00, 95.93)),
    ("100MB", 0.5) -> ((140.33, 135.33, 43.00, 0.33, 82.27)),
    ("100MB", 0.8) -> ((133.00, 130.33, 21.00, 0.00, 87.22)),
    ("100MB", 1.0) -> ((153.33, 142.67, 0.00, 0.00, 0.00)),
    ("500MB", 0.2) -> ((546.00, 526.00, 408.00, 0.00, 95.08)),
    ("500MB", 0.5) -> ((567.33, 553.00, 268.33, 1.00, 95.03)),
    ("500MB", 0.8) -> ((550.33, 539.33, 106.67, 0.67, 90.31)),
    ("500MB", 1.0) -> ((569.33, 527.33, 22.33, 0.00, 0.00)))

  test("stage metrics reproduce the reference's committed result_raw.csv") {
    assume(new java.io.File(RefLogs).isDirectory)
    val paths = LogFiles.globPaths(spark, s"$RefLogs/_100mb_*/*/job_output.log") ++
      LogFiles.globPaths(spark, s"$RefLogs/_500mb_*/*/job_output.log")
    assert(paths.size === 24) // 2 datasets × 4 slowstarts × 3 runs
    val prog = LogFiles.progressEvents(LogFiles.readLines(spark, paths: _*))
    val evts = prog.select(
      col("file").as("run"),
      unix_timestamp(col("ts")).as("epochS"),
      col("map_pct").as("mapPct"),
      col("red_pct").as("redPct")).as[ProgressEvent]
    val perRun = StageAggregator.stageTimes(evts).collect()

    val dims = "_?(\\d+(?:mb|MB|gb|GB|M|G)?)_slowstart_([\\d.]+)".r
    val grouped = perRun.groupBy { case (run, _) =>
      val m = dims.findFirstMatchIn(run).get
      (m.group(1).toUpperCase, m.group(2).toDouble)
    }
    assert(grouped.keySet === expected.keySet)
    grouped.foreach { case (key, runs) =>
      assert(runs.length === 3, s"$key run count")
      def mean(f: StageAggregator.StageTimes => Double): Double =
        math.floor(runs.map(r => f(r._2)).sum / runs.length * 100.0 + 0.5) / 100.0
      val got = (mean(_.totalS), mean(_.mapS), mean(_.shuffleS),
        mean(_.reduceS), mean(_.overlapPct))
      assert(got === expected(key), s"config $key")
    }
  }

  test("monitor ingestion parses every committed 100MB/500MB monitor.log") {
    assume(new java.io.File(RefLogs).isDirectory)
    val paths = LogFiles.globPaths(spark, s"$RefLogs/_100mb_*/*/monitor.log") ++
      LogFiles.globPaths(spark, s"$RefLogs/_500mb_*/*/monitor.log")
    val samples = LogFiles.withRunDims(
      LogFiles.monitorSamples(LogFiles.readLines(spark, paths: _*)))
    // every run yields samples; all CPU/MEM in [0,100]; 3 nodes per run
    val stats = samples.groupBy("dataset", "slowstart", "run_ts")
      .agg(count(lit(1)).as("n"), countDistinct("node").as("nodes"),
        min("cpu").as("mn"), max("cpu").as("mx"))
      .collect()
    assert(stats.length === 24)
    stats.foreach { r =>
      assert(r.getAs[Long]("n") > 0)
      assert(r.getAs[Long]("nodes") === 3)
      assert(r.getAs[Double]("mn") >= 0.0 && r.getAs[Double]("mx") <= 100.0)
    }
  }

  test("R1 counters: shuffle bytes invariant over slowstart (README.md:324-328)") {
    assume(new java.io.File(RefLogs).isDirectory)
    val paths = LogFiles.globPaths(spark, s"$RefLogs/_100mb_*/*/job_output.log")
    val counters = LogFiles.counterRows(LogFiles.readLines(spark, paths: _*))
    // the reference's own sanity cross-check: shuffle volume must not vary
    // with the slowstart parameter — all 12 100MB runs agree byte-for-byte
    val shuffleBytes = counters
      .where(col("counter") === "Reduce shuffle bytes")
      .select("cvalue").distinct().as[Long].collect().toList
    assert(shuffleBytes === List(45810576L))
    val nRuns = counters.where(col("counter") === "Reduce shuffle bytes").count()
    assert(nRuns === 12)
    // golden: 781,397 distinct words at 100MB (BASELINE.md output rows)
    val outRecords = counters
      .where(col("counter") === "Reduce output records")
      .select("cvalue").distinct().as[Long].collect().toList
    assert(outRecords === List(781397L))
    // R2 unit conversion reproduces the README's derived 43.69 MB
    // (README.md:324-328: 45,810,576 B ÷ 2^20, 2-dp)
    val mb = counters.where(col("counter") === "Reduce shuffle bytes")
      .select(graft.functions.Parity.pround(col("cvalue") / 1048576.0, 2))
      .distinct().as[Double].collect().toList
    assert(mb === List(43.69))
  }

  // BASELINE.md (L)-series rows: single flat-layout runs per config, by
  // slowstart — 1G `MapReduceLog/_1G_slowstart_*/job_output.log`, 5G
  // `_5G_*`. These are the only in-tree source covering 1G/5G totals
  // (README's 1G R-series are 3-run means of runs never committed).
  private val expectedFlatTotals = Map(
    ("1G", 0.2) -> 860.0, ("1G", 0.5) -> 851.0,
    ("1G", 0.8) -> 860.0, ("1G", 1.0) -> 1253.0,
    ("5G", 0.2) -> 4479.0, ("5G", 0.5) -> 6094.0,
    ("5G", 0.8) -> 6105.0, ("5G", 1.0) -> 6143.0)

  test("flat-layout 1G/5G totals reproduce BASELINE.md's (L)-series rows " +
      "(the layout the reference's own scanner silently skipped)") {
    assume(new java.io.File(RefLogs).isDirectory)
    val flat = LogFiles.globPaths(spark, s"$RefLogs/_1G_*/job_output.log") ++
      LogFiles.globPaths(spark, s"$RefLogs/_5G_*/job_output.log")
    assume(flat.nonEmpty)
    assert(flat.size === 8) // 2 datasets × 4 slowstarts, one run each
    val prog = LogFiles.progressEvents(LogFiles.readLines(spark, flat: _*))
    val evts = prog.select(
      col("file").as("run"),
      unix_timestamp(col("ts")).as("epochS"),
      col("map_pct").as("mapPct"),
      col("red_pct").as("redPct")).as[ProgressEvent]
    val dims = "_?(\\d+(?:mb|MB|gb|GB|M|G)?)_slowstart_([\\d.]+)".r
    val got = StageAggregator.stageTimes(evts).collect().map { case (run, st) =>
      val m = dims.findFirstMatchIn(run).get
      (m.group(1).toUpperCase, m.group(2).toDouble) -> st.totalS
    }.toMap
    assert(got === expectedFlatTotals)
  }
}
