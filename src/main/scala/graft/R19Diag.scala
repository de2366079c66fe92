package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** r19 optimization-round component timer: prices the building blocks of
  * the hot queries (pair grids, shared-ladder stages, window shapes) so
  * plan changes are driven by measured stage costs, not guesses.
  *
  * Usage: runMain graft.R19Diag <sfDir> <probe> [probe ...]
  */
object R19Diag {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val probes = args.drop(1).toSet
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect()
    def time(name: String)(f: => Long): Unit =
      if (probes.isEmpty || probes(name)) {
        val t0 = System.nanoTime()
        val n = f
        println(f"[r19diag] $name%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s  rows=$n")
        spark.catalog.clearCache()
        System.gc()
      }

    def daily: DataFrame = Tables.orders(spark, sfDir)
      .select(expr("unix_timestamp(o_orderdate) div 86400").as("day"),
        expr("cast(floor(o_totalprice * 100.0 + 0.5) as bigint)").as("c"))
      .groupBy("day").agg(sum("c").as("rev"))
    def pairs: DataFrame = daily.select(col("day").as("d1"), col("rev").as("r1"))
      .join(daily.select(col("day").as("d2"), col("rev").as("r2")),
        col("d1") < col("d2"))
      .select(expr(
        """cast(floor(cast(r2 - r1 as double) / cast(d2 - d1 as double)
          |  * 1000000.0) as bigint)""".stripMargin).as("sl"))

    time("x43.daily")(daily.count())
    time("x43.pairs")(pairs.count())
    time("x43.grp")(pairs.groupBy("sl").agg(count(lit(1))).count())
    time("x43.grp2") {
      val g = pairs.groupBy("sl").agg(count(lit(1)).as("cnt"))
      g.agg(coalesce(sum("cnt"), lit(0L)), min("sl"), max("sl")).count()
    }
    time("x43.full")(operators.Stats.theilSen(Tables.orders(spark, sfDir)).count())

    // t16 components
    val docs = Tables.documents(spark, sfDir)
    import operators.Dedup.tokensExpr
    time("t16.toks")(docs.select(col("doc_id"),
      explode(expr(tokensExpr)).as("w")).count())
    time("t16.uni")(docs.select(col("doc_id"), explode(expr(tokensExpr)).as("w"))
      .groupBy("w").agg(count(lit(1))).count())
    time("t16.ev")(docs.select(col("doc_id"), expr(tokensExpr).as("t"))
      .select(col("doc_id"), explode(expr(
        """CASE WHEN size(t) >= 2
          | THEN transform(sequence(1, size(t) - 1),
          |        i -> concat(element_at(t, i), ' ', element_at(t, i + 1)))
          | ELSE array() END""".stripMargin)).as("bg")).count())
    time("t16.fbg")(docs.select(col("doc_id"), expr(tokensExpr).as("t"))
      .select(col("doc_id"), explode(expr(
        """CASE WHEN size(t) >= 2
          | THEN transform(sequence(1, size(t) - 1),
          |        i -> concat(element_at(t, i), ' ', element_at(t, i + 1)))
          | ELSE array() END""".stripMargin)).as("bg"))
      .groupBy("bg").agg(count(lit(1))).count())
    time("t16.full")(operators.TextAnalysis.bigramSurprisal(docs).count())

    // m9 components
    time("m9.ph")(operators.Multimodal.phashNearDup(docs).count())

    // g25 components
    val aug = docs.select(col("doc_id"), col("text"))
      .unionByName(docs.where(col("doc_id") % 5 === 0)
        .select((col("doc_id") + operators.Dedup.RecallProbeOffset).as("doc_id"),
          col("text")))
    time("g25.sharedSig.build")(
      operators.DedupQueries.sharedSignatures(spark, sfDir).count())
    time("g25.sigAug") {
      val sig = operators.DedupQueries.sharedSignatures(spark, sfDir)
      sig.unionByName(sig.where(col("doc_id") % 5 === 0)
        .withColumn("doc_id", col("doc_id") + operators.Dedup.RecallProbeOffset))
        .count()
    }
    time("g25.cand") {
      val sig = operators.DedupQueries.sharedSignatures(spark, sfDir)
      val sigAug = sig.unionByName(sig.where(col("doc_id") % 5 === 0)
        .withColumn("doc_id", col("doc_id") + operators.Dedup.RecallProbeOffset))
      operators.Dedup.candidatesFromSig(sigAug).count()
    }
    time("g25.clusters") {
      val sig = operators.DedupQueries.sharedSignatures(spark, sfDir)
      val sigAug = sig.unionByName(sig.where(col("doc_id") % 5 === 0)
        .withColumn("doc_id", col("doc_id") + operators.Dedup.RecallProbeOffset))
      operators.Dedup.dedupClusters(
        operators.Dedup.candidatesFromSig(sigAug)).count()
    }
    time("g25.census.lblonly") {
      aug.select(col("doc_id"),
        expr(operators.Dedup.md5Long56(
          "lower(trim(regexp_replace(text, '[ \\t\\n\\r\\f]+', ' ')))"))
          .as("g")).count()
    }
    // does runtime AQE exchange-reuse dedup the bins subtree?
    val events = Tables.events(spark, sfDir)
    def bins: DataFrame = events
      .select(col("event_type").as("g"),
        expr("cast(floor(value * 100.0 + 0.5) as bigint)").as("v"))
      .groupBy("g", "v").agg(count(lit(1)).as("cnt"))
    time("x33.bins.single")(bins.count())
    time("x33.full.lazy")(operators.Stats.winsorizedMean(events).count())
    time("x33.full.lazy2")(operators.Stats.winsorizedMean(events).count())
    def winsorMat(): Long = {
      import org.apache.spark.sql.expressions.Window
      import graft.functions.Parity.pround
      val b = operators.Materialize.frame(bins)
      val w = Window.partitionBy("g").orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cum = b.withColumn("cum", sum("cnt").over(w))
      val tot = b.groupBy("g").agg(sum("cnt").as("n"))
      val j = cum.join(broadcast(tot), "g")
      val lo = j.where(col("cum") >= expr("(n + 19) div 20"))
        .groupBy("g").agg(min("v").as("lo"))
      val hi = j.where(col("cum") >= expr("(19 * n + 19) div 20"))
        .groupBy("g").agg(min("v").as("hi"))
      b.join(broadcast(lo), "g").join(broadcast(hi), "g")
        .select(col("g"),
          (greatest(col("lo"), least(col("hi"), col("v"))) * col("cnt")).as("wv"))
        .groupBy("g").agg(sum("wv").as("sw"))
        .join(broadcast(tot), "g").join(broadcast(lo), "g")
        .join(broadcast(hi), "g")
        .select(col("g").as("event_type"), col("n"),
          col("lo").as("lo_cents"), col("hi").as("hi_cents"),
          pround(expr("(cast(sw as double) / cast(n as double) / 100.0)"), 6)
            .as("winsorized_mean"))
        .orderBy("event_type").count()
    }
    time("x33.full.mat")(winsorMat())
    time("x33.full.mat2")(winsorMat())
    time("k4.full")(operators.KMeans.maximinSeeds(
      Tables.embeddings(spark, sfDir)).count())
    time("g25.full") {
      operators.Dedup.dedupRecallCensus(aug,
        operators.Dedup.dedupClusters(operators.Dedup.candidatesFromSig {
          val sig = operators.DedupQueries.sharedSignatures(spark, sfDir)
          sig.unionByName(sig.where(col("doc_id") % 5 === 0)
            .withColumn("doc_id",
              col("doc_id") + operators.Dedup.RecallProbeOffset))
        })).count()
    }
    spark.stop()
  }
}
