package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** r15 sf10 diagnostic for the exact threshold join (y4/g14): the r14
  * probe and the r15 re-run both lost g14 to transient shuffle-disk
  * exhaustion. This prices each stage of SimilarityJoin.prefixJoin at a
  * scale dir WITHOUT running the full verify: postings, per-doc set
  * sizes, prefix index size, candidate volume before/after the
  * size+positional filters, and the implied verify-shuffle bytes
  * (candidates × both docs' set arrays) — the number that must fit in
  * the local shuffle disk.
  *
  * Usage: runMain graft.G14Diag <sfDir> [t]
  */
object G14Diag {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sf10")
    val t = args.lift(1).map(_.toDouble).getOrElse(0.5)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "256")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.DedupQueries
    val ss = graft.operators.Materialize.frame(
      DedupQueries.sharedShingles(spark, dir))
    println(s"[g14diag] postings=${ss.count()}")
    val sz = ss.groupBy("doc_id").agg(count(lit(1)).as("n"))
    sz.agg(count(lit(1)).as("docs"), max("n").as("max_set"),
      avg("n").as("avg_set")).show(false)
    // prefixJoin's candidate pipeline, stage by stage
    val docFreq = ss.groupBy("sh_h").agg(count(lit(1)).as("df"))
    val ranked = ss
      .join(docFreq, "sh_h")
      .withColumn("n", count(lit(1)).over(Window.partitionBy("doc_id")))
      .withColumn("r", row_number().over(
        Window.partitionBy("doc_id").orderBy("df", "sh_h")))
    val prefix = ranked
      .where(col("r") <= col("n") - ceil(col("n") * t) + 1)
      .select("doc_id", "sh_h", "n", "r")
      .transform(graft.operators.Materialize.frame)
    println(s"[g14diag] prefix_postings=${prefix.count()}")
    val rawCand = prefix.as("a").join(prefix.as("b"),
      col("a.sh_h") === col("b.sh_h") &&
        col("a.doc_id") < col("b.doc_id") &&
        col("b.n") >= ceil(col("a.n") * t) &&
        col("a.n") >= ceil(col("b.n") * t) &&
        (lit(1) + least(col("a.n") - col("a.r"), col("b.n") - col("b.r"))) >=
          ceil((col("a.n") + col("b.n")) * (t / (1 + t))))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
    println(s"[g14diag] raw_collisions=${rawCand.count()}")
    val cand = graft.operators.Materialize.frame(rawCand.distinct())
    val nCand = cand.count()
    println(s"[g14diag] candidates=$nCand")
    // verify-shuffle estimate: each candidate row ships both sets once
    val bytes = cand
      .join(sz.select(col("doc_id").as("doc_a"), col("n").as("na")), "doc_a")
      .join(sz.select(col("doc_id").as("doc_b"), col("n").as("nb")), "doc_b")
      .agg(sum((col("na") + col("nb")) * 8L).as("verify_bytes"))
      .collect()(0).getLong(0)
    println(f"[g14diag] verify_shuffle_est=${bytes / 1e9}%.1f GB")
    spark.stop()
  }
}
