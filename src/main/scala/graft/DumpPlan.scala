package graft

import org.apache.spark.sql.SparkSession

/** Prints executed plans of registered queries — the ad-hoc counterpart
  * of [[Plans]] (which regenerates the curated PLANS.md).
  *
  * Usage: runMain graft.DumpPlan <sfDir> <mode> <queryName> [more ...]
  *   mode: "formatted" or "simple" (executedPlan.toString, what
  *   PlanAuditSpec matches against).
  */
object DumpPlan {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val mode = args(1)
    val names = args.drop(2).toSeq
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      val q = Registry.all.find(_.name == name)
        .getOrElse(sys.error(s"unknown query: $name"))
      println(s"==== $name ====")
      val df = q.run(spark, sfDir)
      if (mode == "simple") println(df.queryExecution.executedPlan.toString)
      else df.explain(mode)
    }
    spark.stop()
  }
}
