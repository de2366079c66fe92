package graft

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

import graft.operators.{Dedup, DedupQueries}

/** r20 contraction-loop evidence: counts Spark JOBS submitted during a
  * dedupClusters run (VERDICT r19 item 5 asks for R19Diag-style job
  * counts showing the per-round relabel-compose merge). Jobs are the
  * per-round latency unit the restructure targets — each Materialize /
  * isEmpty in the loop is one job.
  *
  * Usage: runMain graft.R20Diag <sfDir>
  */
object R20Diag {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect()
    val jobs = new AtomicInteger
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    })
    def counted(name: String)(f: => (Long, Int)): Unit = {
      Thread.sleep(1000) // drain listener bus from prior work
      val j0 = jobs.get
      val t0 = System.nanoTime()
      val (rows, rounds) = f
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(1000) // listener events are async
      println(f"[r20diag] $name%-24s jobs=${jobs.get - j0}%3d " +
        f"rounds=$rounds%2d $sec%6.2f s rows=$rows")
      spark.catalog.clearCache()
    }
    // real corpus candidate graph (pays the shared ladder on first use)
    counted("clusters.corpus") {
      val pairs = DedupQueries.sharedCandidates(spark, sfDir)
      val (labels, rounds) = Dedup.dedupClustersWithRounds(pairs)
      (labels.count(), rounds)
    }
    // synthetic 256-chain: maximizes round count (pointer-jumping path),
    // so the per-round job saving is visible even when the corpus graph
    // converges in 2-3 rounds
    counted("clusters.chain256") {
      import spark.implicits._
      val pairs = (1L until 256L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
      val (labels, rounds) = Dedup.dedupClustersWithRounds(pairs)
      (labels.count(), rounds)
    }
    spark.stop()
  }
}
