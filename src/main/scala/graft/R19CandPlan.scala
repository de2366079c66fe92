package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, DedupQueries, TextAnalysis}

/** Dumps the g25/g30 CANDIDATE-pipeline plans (the part the r19 rewires
  * changed — invisible in the registered queries' final plans because
  * dedupClusters consumes it eagerly). Usage: runMain graft.R19CandPlan <dir> */
object R19CandPlan {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.01")
    val s = SparkSession.builder().master("local[4]")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    println("==== g25_candidate_pipeline ====")
    val sig = DedupQueries.sharedSignatures(s, d)
    val sigAug = sig.unionByName(sig.where(col("doc_id") % 5 === 0)
      .withColumn("doc_id", col("doc_id") + Dedup.RecallProbeOffset))
    Dedup.candidatesFromSig(sigAug).explain("formatted")
    println("==== g30_candidate_pipeline ====")
    val fp = DedupQueries.sharedBucketedWinnowFps(s, d)
    val fpAug = fp.unionByName(fp.where(col("doc_id") % 5 === 0)
      .withColumn("doc_id", col("doc_id") + Dedup.RecallProbeOffset))
    TextAnalysis.candidatesFromDistinctFps(fpAug)
      .select("doc_a", "doc_b").explain("formatted")
    s.stop()
  }
}
