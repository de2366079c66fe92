package graft

import org.apache.spark.sql.functions._
import graft.sources.LogFiles
import graft.operators.Relational
import graft.plans.StageAggregator
import graft.plans.StageAggregator.ProgressEvent

/** End-to-end parity for the wide pivot CSVs (`result_time.csv`,
  * `result_map.csv`): reference logs → our scan (both layouts) → stage
  * times → R5 pivot → R6 best-with-ties, compared against the committed
  * rows — including the `1G → "0.5,0.8"` comma-joined tie that is the
  * R6 golden (`result_map.csv:4`).
  *
  * The 1G cells come from the FLAT-layout logs the reference's committed
  * scanner could not read; 0.2/0.5/0.8 match the CSV exactly, proving
  * the missing script consumed these very files. (The committed
  * `_1G_slowstart_1.0` log is a different run than the CSV's 927.00 —
  * its cell is excluded; the best-parameter selection is unaffected.)
  */
class PivotParitySpec extends SparkSpec {
  import spark.implicits._

  private val RefLogs = "/root/reference/MapReduceLog"

  private lazy val wide = {
    val paths = LogFiles.globPaths(spark, s"$RefLogs/*/*/job_output.log") ++
      LogFiles.globPaths(spark, s"$RefLogs/_1G_*/job_output.log")
    val prog = LogFiles.progressEvents(LogFiles.readLines(spark, paths: _*))
    val evts = prog.select(
      col("file").as("run"), unix_timestamp(col("ts")).as("epochS"),
      col("map_pct").as("mapPct"), col("red_pct").as("redPct"))
      .as[ProgressEvent]
    val perRun = StageAggregator.stageTimes(evts).toDF("file", "st")
    val means = LogFiles.withRunDims(perRun)
      .groupBy("dataset", "slowstart")
      .agg(graft.functions.Parity.pround(
        graft.functions.Parity.exactAvg(col("st.totalS")), 2).as("total"),
        graft.functions.Parity.pround(
          graft.functions.Parity.exactAvg(col("st.mapS")), 2).as("map_t"))
    means.cache()
  }

  private def pivotOf(metric: String) =
    wide.groupBy("dataset")
      .pivot("slowstart", Seq("0.2", "0.5", "0.8", "1.0"))
      .agg(first(col(metric)))

  test("R5 pivot reproduces result_time.csv 100MB/500MB rows + 1G cells") {
    assume(new java.io.File(RefLogs).isDirectory)
    val rows = pivotOf("total").collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    assert(rows("100MB") === ((134.33, 140.33, 133.00, 153.33)))
    assert(rows("500MB") === ((546.00, 567.33, 550.33, 569.33)))
    val g = rows("1G")
    assert((g._1, g._2, g._3) === ((860.00, 851.00, 860.00))) // flat-layout logs
  }

  test("R6 best-with-ties reproduces Best_SlowStart incl. the 1G '0.5,0.8' tie") {
    assume(new java.io.File(RefLogs).isDirectory)
    def bests(metric: String): Map[String, String] =
      Relational.bestParamTies(
        wide.select(col("dataset"), col("slowstart"), col(metric)),
        "dataset", "slowstart", metric, asc = true)
        .as[(String, String)].collect().toMap
    val bTime = bests("total")
    assert(bTime("100MB") === "0.8") // result_time.csv
    assert(bTime("500MB") === "0.2")
    assert(bTime("1G") === "0.5")
    val bMap = bests("map_t")
    assert(bMap("100MB") === "0.8") // result_map.csv
    assert(bMap("500MB") === "0.2")
    assert(bMap("1G") === "0.5,0.8") // the committed comma-joined tie
  }
}
