package graft

import org.apache.spark.sql.SparkSession

/** Prints the executed plan of one registered query — the ad-hoc
  * counterpart of [[Plans]] (which regenerates the curated PLANS.md).
  *
  * Usage: runMain graft.DumpPlan <queryName> [sfDir] [mode]
  *   mode: "formatted" (default) or "simple" (executedPlan.toString,
  *   what PlanAuditSpec matches against).
  */
object DumpPlan {
  def main(args: Array[String]): Unit = {
    val name = args.head
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.001")
    val mode = args.lift(2).getOrElse("formatted")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val q = Registry.all.find(_.name == name)
      .getOrElse(sys.error(s"unknown query: $name"))
    val df = q.run(spark, sfDir)
    if (mode == "simple") println(df.queryExecution.executedPlan.toString)
    else df.explain(mode)
    spark.stop()
  }
}
