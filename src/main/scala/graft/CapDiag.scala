package graft

import org.apache.spark.sql.SparkSession

/** df-cap scale probe (r14 sf10 finding): at a 100x-replicated corpus
  * the fixed DefaultShingleDfCap=1000 admits the df in (dup-group-size,
  * cap] hot tail, whose per-shingle emission is df^2 — g4/g14 exhaust
  * 70 GB of shuffle disk at sf10. The DISCRIMINATIVE shingles for
  * dup-group recall have df ~ group size (100 here), so a cap tracking
  * the expected group size (with headroom) keeps the recall shingles
  * and drops only the quadratic tail. This main prices that: it times
  * g4's exact top-k Jaccard join at the given caps on a scale dir.
  *
  * Usage: runMain graft.CapDiag <sfDir> <cap1,cap2,...>
  */
object CapDiag {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/sf10")
    val caps = args.lift(1).getOrElse("150").split(",").map(_.trim.toInt)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "256")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.{Dedup, DedupQueries}
    caps.foreach { cap =>
      val t0 = System.nanoTime()
      val n = Dedup.ngramJaccardJoin(
        DedupQueries.sharedShingles(spark, sfDir), 20, dfCap = Some(cap)).count()
      println(f"[capdiag] dfCap=$cap rows=$n time=${(System.nanoTime() - t0) / 1e9}%.1f s")
      spark.catalog.clearCache()
      System.gc()
    }
    spark.stop()
  }
}
