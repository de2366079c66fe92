package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.LogAnalytics

/** Real log-file ingestion (SURVEY.md §1.3/§1.4, §2.D A1/A2/A10).
  *
  * The delimiter sessionization (A2) needs stable per-file line numbers,
  * which `spark.read.text` does not provide. We read each file whole
  * (`wholetext`) and posexplode its lines — correct and simple because
  * individual monitor/job logs are intrinsically small (a few KB–MB);
  * the 100 TB corpus is *many* such files, which this plan parallelizes
  * per-file. A single giant file would need RDD zipWithIndex instead
  * (documented trade-off, SURVEY §7 risk 1).
  */
object LogFiles {

  /** (file, line_no, line) with per-file line order preserved. */
  def readLines(spark: SparkSession, paths: String*): DataFrame =
    spark.read.option("wholetext", "true")
      .option("recursiveFileLookup", "true").text(paths: _*)
      .select(input_file_name().as("file"),
        posexplode(split(col("value"), "\n")).as(Seq("line_no", "line")))

  /** Expand a glob to concrete paths (empty when nothing matches —
    * `spark.read` would throw PATH_NOT_FOUND on a matchless glob, and a
    * scan root may legitimately contain only one of the two layouts). */
  def globPaths(spark: SparkSession, pattern: String): Seq[String] = {
    val p = new org.apache.hadoop.fs.Path(pattern)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    Option(fs.globStatus(p)).map(_.toSeq.map(_.getPath.toString))
      .getOrElse(Seq.empty)
  }

  private val samplePat = "\\[(\\w+-\\w+)\\] CPU: ([\\d.]+)% \\| MEM: (\\d+)%"

  private def numOrNull(c: Column, t: String): Column =
    when(c === "", lit(null)).otherwise(c).cast(t)

  /** A1+A2 over real files: parse sample lines and assign Time_Step by
    * counting `----` delimiter lines before each row (running sum over a
    * per-file window, common_utils.py:24-33). Files killed mid-group
    * (no footer, reference `run_mr_real.sh:64`) parse fine — the trailing
    * partial group is simply the last step. Fallback when a file has no
    * delimiters at all: step = sample_index / 3 (common_utils.py:32-33). */
  def monitorSamples(lines: DataFrame): DataFrame = {
    val wOrd = Window.partitionBy("file").orderBy("line_no")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy("file")
    val parsed = lines
      .withColumn("is_delim", col("line").startsWith("----"))
      .withColumn("step_raw",
        sum(when(col("is_delim"), 1).otherwise(0)).over(wOrd))
      .withColumn("n_delims", sum(when(col("is_delim"), 1).otherwise(0)).over(wAll))
      .select(col("file"), col("line_no"), col("step_raw"), col("n_delims"),
        regexp_extract(col("line"), samplePat, 1).as("node"),
        numOrNull(regexp_extract(col("line"), samplePat, 2), "double").as("cpu"),
        numOrNull(regexp_extract(col("line"), samplePat, 3), "double").as("mem"))
      .where(col("node") =!= "")
    val wSample = Window.partitionBy("file").orderBy("line_no")
    parsed
      .withColumn("sample_idx", row_number().over(wSample) - 1)
      .select(col("file"),
        when(col("n_delims") > 0, col("step_raw"))
          .otherwise(floor(col("sample_idx") / 3)).cast("int").as("time_step"),
        col("node"), col("cpu"), col("mem"))
  }

  /** A3 over real files: progress events with event-time timestamps. */
  def progressEvents(lines: DataFrame): DataFrame = {
    val pat = "(\\d{4}-\\d{2}-\\d{2} \\d{2}:\\d{2}:\\d{2}),\\d+ INFO mapreduce.Job:  map (\\d+)% reduce (\\d+)%"
    val tsStr = regexp_extract(col("line"), pat, 1)
    lines.select(col("file"),
      when(tsStr === "", lit(null)).otherwise(
        to_timestamp(tsStr, "yyyy-MM-dd HH:mm:ss")).as("ts"),
      numOrNull(regexp_extract(col("line"), pat, 2), "int").as("map_pct"),
      numOrNull(regexp_extract(col("line"), pat, 3), "int").as("red_pct"))
      .where(col("ts").isNotNull)
  }

  /** R1 over real files: counter block rows `\t\tName=value`. */
  def counterRows(lines: DataFrame): DataFrame = {
    val pat = "\\t\\t([\\w -]+)=(\\d+)"
    lines.select(col("file"),
      regexp_extract(col("line"), pat, 1).as("counter"),
      numOrNull(regexp_extract(col("line"), pat, 2), "long").as("cvalue"))
      .where(col("counter") =!= "")
  }

  /** A10: run dimensions from the file path — handles both nested
    * (`_100mb_slowstart_0.5/<ts>/monitor.log`) and flat
    * (`_5G_slowstart_1.0/monitor.log`) layouts (SURVEY §0 quirk; the
    * reference's committed scanner silently skipped flat runs). */
  def withRunDims(df: DataFrame): DataFrame = {
    val pat = "_?(\\d+(?:mb|MB|gb|GB|M|G)?)_slowstart_([\\d.]+)"
    df.withColumn("dataset", upper(regexp_extract(col("file"), pat, 1)))
      .withColumn("slowstart",
        numOrNull(regexp_extract(col("file"), pat, 2), "double"))
      .withColumn("run_ts",
        regexp_extract(col("file"), "/(\\d{8}_\\d{6})/", 1))
      .where(col("dataset") =!= "")
  }

  /** Full A10→A13 pipeline over a real run tree: scan, parse, dims,
    * per-run-per-step cluster means, then cross-run mean-of-means. */
  def cpuTrends(spark: SparkSession, rootDir: String): DataFrame = {
    import graft.functions.Parity.{exactAvg, pround}
    val paths = globPaths(spark, s"$rootDir/*/monitor.log") ++
      globPaths(spark, s"$rootDir/*/*/monitor.log")
    require(paths.nonEmpty, s"no monitor.log under $rootDir")
    val samples = withRunDims(monitorSamples(readLines(spark, paths: _*)))
    samples
      .groupBy("dataset", "slowstart", "run_ts", "time_step")
      .agg(exactAvg(col("cpu")).as("run_step_cpu"))
      .groupBy("dataset", "slowstart", "time_step")
      .agg(pround(exactAvg(col("run_step_cpu")), 2).as("cpu"))
  }
}
