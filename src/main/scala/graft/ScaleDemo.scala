package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale sweep for the LLM-pipeline operators: replicate the sf0.1
  * corpus/embeddings F× and time each operator at 1× and F×, printing a
  * JSON line per run. Near-linear growth in wall time (and candidate
  * counts that stay bounded by design) is the evidence that the operator
  * shapes — bucketed LSH joins instead of all-pairs, single-pass
  * signatures, mergeable sketches, pointer-jumping components — survive
  * scale-up; a quadratic shape would blow up visibly at F=20 already.
  *
  * Replication is NOT a pure copy: replica r of a doc keeps the text but
  * gets a distinct doc_id, so exact/near-dup operators see F-sized
  * duplicate cliques — the worst (densest) case for candidate generation
  * and clustering, which is exactly what we want to stress.
  *
  * Usage: runMain graft.ScaleDemo [factor]
  */
object ScaleDemo {

  private def time[T](f: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = f
    (r, (System.nanoTime() - t0) / 1e9)
  }

  def replicateDocs(docs: DataFrame, factor: Int): DataFrame =
    docs.withColumn("replica", explode(expr(s"sequence(0, ${factor - 1})")))
      .select((col("doc_id") * factor + col("replica")).as("doc_id"),
        col("text"), col("lang"), col("source"), col("n_chars"))

  def replicateVecs(vecs: DataFrame, factor: Int): DataFrame =
    vecs.withColumn("replica", explode(expr(s"sequence(0, ${factor - 1})")))
      .select((col("vec_id") * factor + col("replica")).as("vec_id"),
        col("embedding"), col("label"))

  /** Replicated events keep their user_id, so per-user streams grow F× —
    * the worst case for the user-partitioned window operators. */
  def replicateEvents(events: DataFrame, factor: Int): DataFrame =
    events.withColumn("replica", explode(expr(s"sequence(0, ${factor - 1})")))
      .select((col("event_id") * factor + col("replica")).as("event_id"),
        col("ts"), col("user_id"), col("event_type"), col("value"),
        col("props"))

  def main(args: Array[String]): Unit = {
    val factor = args.headOption.map(_.toInt).getOrElse(20)
    require(factor >= 1, s"factor must be >= 1, got $factor " +
      "(sequence(0, factor-1) would count DOWNWARD and corrupt doc_ids)")
    // optional second arg: comma-separated op names — sweep only those
    // (new-operator baselining without re-running the full matrix)
    val only: Option[Set[String]] =
      args.lift(1).map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    def keep(fns: Seq[(String, DataFrame => Long)]) =
      only.fold(fns)(sel => fns.filter(f => sel(f._1)))
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // untimed warmup so the first measured operator isn't charged JVM /
    // codegen startup (same rationale as Bench)
    spark.range(1000000L).selectExpr("sum(id)").collect()
    operators.Dedup.exactDedup(Tables.documents(spark, sfDir)).count()

    // materialize the replicated inputs once so operator timings measure
    // the operator, not the replication explode
    val docs1 = Tables.documents(spark, sfDir).localCheckpoint()
    val docsF = replicateDocs(docs1, factor).localCheckpoint()
    val vecs1 = Tables.embeddings(spark, sfDir).localCheckpoint()
    val vecsF = replicateVecs(vecs1, factor).localCheckpoint()

    val ops: Seq[(String, DataFrame => Long)] = Seq(
      "exact_dedup" -> (d => operators.Dedup.exactDedup(d).count()),
      "minhash_sig" -> (d => operators.Dedup.minhashSignature(d, 4).count()),
      "minhash_pairs" -> (d => operators.Dedup.minhashCandidates(d, 4).count()),
      // the bucket join under a cap BELOW the replication factor: every
      // F-clique bucket is now "hot" and excluded, so the candidate
      // count collapses — the direct demonstration (mirroring
      // ngram_candidates_cap16) that the bucket-df cap, not luck,
      // bounds per-bucket emission at cap²/2 at any corpus size
      "minhash_pairs_cap16" -> (d =>
        operators.Dedup.minhashCandidates(d, 4, bucketCap = Some(16)).count()),
      "dedup_clusters" -> (d =>
        operators.Dedup.dedupClusters(operators.Dedup.minhashCandidates(d, 4))
          .count()),
      "simhash" -> (d => operators.Dedup.simhash(d).count()),
      // vocab-sized state: replicating docs grows token COUNT but barely
      // the vocab, so the merge loop's per-round cost should stay ~flat
      // with the replication factor — the property that makes BPE
      // training affordable at corpus scale
      "bpe_merges" -> (d => operators.TextAnalysis.bpeMerges(d, 4).count()),
      "cms_sketch" -> (d => operators.Sketch.cmsSketch(d, 4, 64).count()),
      "langid" -> (d => operators.TextAnalysis.langId(d).count()),
      "hll_distinct" -> (d => operators.Stats.hllDistinctWords(d).count()),
      "stratified_sample" -> (d =>
        operators.Sampling.stratifiedSample(d, "lang", 20).count()),
      "weighted_sample" -> (d =>
        operators.Sampling.weightedSample(d, "n_chars", 50).count()),
      "chunk_dedup" -> (d => operators.Packing.chunkDedup(d, 3, 3).count()),
      "zipf_fit" -> (d => operators.TextAnalysis.zipfFit(d).count()),
      // per-token codegen predicate + one doc_id reduction: linear
      "lexicon_screen" -> (d => operators.TextAnalysis.lexiconScreen(d).count()),
      // the x4-budget ladder explodes the per-doc LENGTH table, never
      // the text — F x docs widen the tokenize pass and the running sums
      "pack_fill_ladder" -> (d => operators.Packing.packFillLadder(d).count()),
      // outcome-level cap monitor: norm groups x cluster labels, both
      // doc_id reductions; pair masses are combinable counts
      "dedup_recall" -> (d => operators.Dedup.dedupRecallCensus(d,
        operators.Dedup.dedupClusters(operators.Dedup.minhashCandidates(d, 4))).count()),
      // cap-bite probe (r13, VERDICT item 8): plant one dup group LARGER
      // than the cap CEILING on top of the replicated corpus. The capped
      // join must drop it wholesale (never a pairwise comparison); the
      // recorded value is the census's LOST pair mass, and the planted
      // C(1050, 2) = 550725 is always part of it. r16 note: the cap is
      // now density-DERIVED, so at high replication factors the budget
      // rule may also drop organic replica buckets (df ≈ 20×F) — the
      // value then reads planted + organic loss; the probe's invariant
      // is that it NEVER reads less than the planted mass.
      "dedup_recall_capbite" -> { d =>
        val aug = operators.Dedup.plantBoilerplate(
          d, operators.Dedup.DefaultBucketDfCap + 50)
        operators.Dedup.dedupRecallCensus(aug,
            operators.Dedup.dedupClusters(
              operators.Dedup.minhashCandidates(aug, 4)))
          .select(expr("exact_pairs - captured_pairs"))
          .head.getLong(0)
      },
      "cluster_reps" -> (d => operators.Dedup.clusterReps(d, 4).count()),
      "incr_neardup" -> (d => operators.Dedup.minhashIncremental(
        d.where(col("doc_id") % 2 === 0), d.where(col("doc_id") % 2 === 1), 4).count()),
      "psi_drift" -> (d => operators.Sampling.psiDrift(d).count()),
      "pii_scrub" -> (d => operators.TextAnalysis.piiScrub(d).count()),
      // KL's corpus pass is ONE materialized (source, word) count; the
      // |vocab|×|sources| grid downstream must grow with vocab only
      "source_kl" -> (d => operators.TextAnalysis.sourceUnigramKl(d).count()),
      "chi2_table" -> (d => operators.Stats.chi2Contingency(d).count()),
      "dup_ngram_rate" -> (d => operators.Contamination.dupNgramRate(d).count()),
      "winnow" -> (d => operators.TextAnalysis.winnowFingerprints(d, 4).count()),
      // like ngram_candidates, 20x replication means every fingerprint is
      // shared by its 20 replicas — candidates grow ~F² by construction
      "winnow_candidates" -> (d =>
        operators.TextAnalysis.winnowCandidates(d, 4).count()),
      // g4's candidate set under the default df cap: replication multiplies
      // every shingle's df by F, so candidates grow ~F² — that is GENUINE
      // duplicate density (each F-clique really contains C(F,2) dup pairs;
      // any exact emitter produces at least that), not hot-shingle blowup
      "ngram_candidates" -> (d => operators.Dedup.ngramCandidates(
        operators.Dedup.shingleHashRows(d).distinct(),
        Some(operators.Dedup.DefaultShingleDfCap)).count()),
      // the same index under a cap BELOW the replication factor: every
      // replicated shingle is now "hot" and excluded, so the candidate
      // count collapses — the direct demonstration that the cap, not
      // luck, bounds per-shingle emission (at cap²/2) at any corpus size
      "ngram_candidates_cap16" -> (d => operators.Dedup.ngramCandidates(
        operators.Dedup.shingleHashRows(d).distinct(), Some(16)).count()),
      // per-word moments + TakeOrdered cap: F× docs widen the explode,
      // never the |vocab|-row moment table or the top-k
      "burstiness" -> (d => operators.TextAnalysis.wordBurstiness(d).count()),
      // sink throughput (VERDICT r8 gap: W8/R7 were spec-only — no write
      // path ever appeared in a bench artifact). The timed section covers
      // compute + write + a read-back line count that doubles as the row
      // evidence. W8 is the data-scale sink (one file per partition, no
      // global sort); R7 is the tiny-rollup CSV (coalesce(1) by contract).
      "sink_w8_tsv" -> (d => {
        val out = java.nio.file.Files.createTempDirectory("graft_w8_").toString
        operators.WordCount.writeTsv(operators.WordCount.wordCount(d), out)
        d.sparkSession.read.text(out).count()
      }),
      "sink_r7_csv" -> (d => {
        val out = java.nio.file.Files.createTempDirectory("graft_r7_").toString
        val census = d.groupBy("lang").agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("chars"))
        operators.Relational.writeResultCsv(census, out)
        d.sparkSession.read.option("header", "true").csv(out).count()
      }),
      // round-11 additions: every one must reduce to a bounded census
      // (|sources|, |langs|, vocab, or column count) before anything
      // non-combinable happens — F× docs may only widen the first pass
      "hapax" -> (d => operators.TextAnalysis.hapaxCensus(d).count()),
      // the word self-join's fan-out is |sources|², not doc-scale; F×
      // replication grows the distinct (source, word) index sublinearly
      "vocab_overlap" -> (d => operators.TextAnalysis.vocabOverlap(d).count()),
      "char_classes" -> (d => operators.TextAnalysis.charClassProfile(d).count()),
      "log_odds" -> (d => operators.TextAnalysis.logOddsKeywords(d).count()),
      "simpson" -> (d => operators.TextAnalysis.simpsonDiversity(d).count()),
      "cross_lang_open" -> (d => operators.Dedup.crossLangDupCensus(d).count()),
      "pack_fill" -> (d => operators.Packing.packFill(d, "lang", 512).count()),
      "storage_budget" -> (d => operators.Multimodal.storageBudget(d).count()),
      // one multi-distinct aggregate: the Expand multiplies rows in
      // flight by 2|cols| but map-side combine bounds what shuffles
      "column_profile" -> (d => operators.Profiling.columnProfile(
        d.select("doc_id", "lang", "source", "n_chars")).count()),
      // PMI joins are vocab-sized after the observed-bigram reduction;
      // F× docs widen only the explode pass, and top-k is TakeOrdered
      "pmi_colloc" -> (d => operators.TextAnalysis.pmiCollocations(d).count()),
      // like ngram_candidates: F× replication makes every doc an exact
      // F-clique, so near-dup pairs grow ~F² by construction — genuine
      // duplicate density; band buckets stay person-sized, never df²
      "phash_neardup" -> (d => operators.Multimodal.phashNearDup(d).count()),
      // F× replication turns every doc into an F-clique: pairs grow ~F²
      // and triangles ~F³ BY CONSTRUCTION (a 20-clique really holds 1140
      // triangles) — output-bound like phash_neardup; the orientation
      // keeps per-edge wedge fan-out degeneracy-bounded throughout
      "triangles" -> (d => operators.Graph.triangleCensus(
        operators.Dedup.minhashCandidates(d, 4)).count()),
      // RA pivots are degree-capped at 256; the F-clique degree is ~F so
      // replication leaves pivots under the cap — fan-out grows with the
      // genuine clique density, and the top-k is TakeOrdered
      "link_predict" -> (d => operators.Graph.resourceAllocTop(
        operators.Dedup.minhashCandidates(d, 4), 15).count()),
      // the agreement histogram reduces the same bucket join g2 pays;
      // the ladder is a 4-row window — F× docs only widen the join
      "band_agreement" -> (d => operators.Dedup.bandAgreementCurve(d).count()),
      // both dedup rules reduce on 16-byte digest keys; F× replication
      // makes every doc a byte-dup clique — flags stay per-doc bounded
      "norm_vs_byte_dup" -> (d =>
        operators.Multimodal.normVsByteDupCensus(d).count()),
      // one tokenize pass to |shards| rows — the census is constant-size
      "shard_balance" -> (d => operators.Packing.shardBalance(d).count()),
      // the full curation funnel: g1 + g2c(F-clique dense) + t19 flags
      // in one doc_id-keyed join tree; output is 4 rows at any scale
      "yield_funnel" -> (d => {
        val flags = operators.TextAnalysis.gopherFlags(d)
          .select(col("doc_id"), col("n_tokens"),
            (col("p_len") && col("p_wlen") && col("p_stop") &&
              col("p_alpha")).as("pq"))
        val ek = operators.Dedup.exactDedup(d)
          .select(col("doc_id")).withColumn("ke", lit(1L))
        val nd = operators.Dedup.minhashNearDups(d, 4, 4)
          .select(col("doc_b").as("doc_id")).distinct()
          .withColumn("nd", lit(1L))
        flags.join(ek, Seq("doc_id"), "left").join(nd, Seq("doc_id"), "left")
          .agg(sum(when(col("ke").isNotNull && col("nd").isNull &&
            col("pq"), 1L).otherwise(0L))).count()
      }))
    val vecOps: Seq[(String, DataFrame => Long)] = Seq(
      "lsh_buckets" -> (v => operators.Similarity.lshBuckets(v, 4).count()),
      "ivf_assign" -> (v => operators.Similarity.ivfAssign(v, 16).count()),
      "kmeans_step" -> (v => operators.KMeans.kmeansStep(v, 6).count()),
      // broadcast centroids, k-bounded vec_id window, |clusters| rows
      "silhouette" -> (v => operators.KMeans.simplifiedSilhouette(v, 6).count()),
      "semdedup" -> (v => operators.Similarity.semDedup(v, 16, 0.40).count()),
      "pq_assign" -> (v => operators.Similarity.pqAssign(v, 4, 4).count()),
      "dim_stats" -> (v => operators.Similarity.dimStats(v).count()),
      // both reduce to |labels|×d moments in one explode pass — the
      // downstream pair join must stay constant-size as the corpus grows
      "centroid_matrix" -> (v => operators.Similarity.centroidMatrix(v).count()),
      "label_spread" -> (v => operators.Similarity.labelSpread(v).count()),
      // fusion/ladder consume k-bounded lists; F× corpus grows only the
      // component scans, never the combiner
      "rrf_fusion" -> (v => operators.Similarity.rrfFusion(v).count()),
      "mrl_recall" -> (v => operators.Similarity.mrlRecall(v, 5, 5).count()),
      // round-11: margin census is s5's broadcast-assign plus a k-row
      // rollup; the shift census joins k1's k×d table, never the corpus;
      // the PCA step is ONE posexplode pass to d accumulator rows
      "assign_margin" -> (v => operators.Similarity.assignMarginCensus(v, 16).count()),
      "kmeans_shift" -> (v => operators.KMeans.kmeansShift(v, 6).count()),
      "pca_step" -> (v => operators.Similarity.pcaPowerStep(v).count()),
      // one scan to 64 accumulator rows; the weight literal rides in the
      // plan, so F× vectors must scale linearly with zero extra shuffles
      "svm_step" -> (v => operators.Similarity.svmStep(v).count()),
      // the s8 assignment plus one m-row rollup — broadcast codebook,
      // so F× vectors only widen the piece explode
      "pq_distortion" -> (v => operators.Similarity.pqDistortion(v).count()),
      // one scored frame + two window ranks per (tiny) query partition
      "filtered_topk" -> (v => operators.Similarity.filteredTopK(v).count()),
      // two half-corpus assignment passes + a k*d-row merge — the
      // partial-state path a multi-batch k-means accumulates through
      "kmeans_merge" -> (v => operators.KMeans.kmeansMergeProof(v, 6).count()))
    val eventOps: Seq[(String, DataFrame => Long)] = Seq(
      "event_transitions" -> (e => operators.Funnel.eventTransitions(e).count()),
      "funnel" -> (e => operators.Funnel.funnelConversion(e).count()),
      "sketch_quantiles" -> (e =>
        operators.Profiling.sketchQuantiles(e, "event_type", "value").count()),
      "zorder_stats" -> (e => operators.Stats.zorderClustering(e).count()),
      "salted_count" -> (e =>
        operators.Skew.saltedCount(e, "event_type", "event_id", 32).count()),
      // KS's window domain is the quantized bin table — constant in the
      // corpus size, so F× more events must not widen the window input
      "ks_two_sample" -> (e =>
        operators.Stats.ksTwoSample(e, "purchase", "click").count()),
      // rank/median windows must stay on the value-domain bins as rows
      // grow; per-user and per-day reductions are one combinable pass
      "mann_whitney" -> (e => operators.Stats.mannWhitneyU(e).count()),
      "prop_ztest" -> (e => operators.Stats.propZTest(e).count()),
      "time_to_convert" -> (e => operators.Funnel.timeToConvert(e).count()),
      "dow_seasonality" -> (e => operators.Stats.dowSeasonality(e).count()),
      "daily_autocorr" -> (e => operators.Stats.dailyRevenueAutocorr(e).count()),
      // round-11: all reduce to bounded tables (types², depths, bins,
      // days, deciles) on ONE user_id/day/bin-keyed pass before any
      // window or join — F× events widen only the first reduction
      "markov" -> (e => operators.Funnel.markovMatrix(e).count()),
      "session_depth" -> (e => operators.Funnel.sessionDepthHistogram(e, 21600L).count()),
      "last_touch" -> (e => operators.Funnel.lastTouchAttribution(e).count()),
      "lorenz" -> (e => operators.Stats.lorenzDeciles(e).count()),
      "cusum" -> (e => operators.Stats.cusumChangepoint(e).count()),
      "tukey" -> (e => operators.Stats.tukeyOutliers(e).count()),
      "dow_anova" -> (e => operators.Stats.dowAnova(e).count()),
      "mad" -> (e => operators.Stats.madValue(e).count()),
      "benford" -> (e => operators.Stats.benfordDigits(e).count()),
      // RFM: one user_id reduction, then quartile maps over |distinct
      // value| tables only — F× events must not widen any window input
      "rfm" -> (e => operators.Funnel.rfmSegments(e).count()),
      // the 64-way permutation explode (x57) happens on the DAY table, never the
      // facts — F× events widen only the first day reduction
      "perm_test" -> (e => operators.Stats.permTest(e).count()),
      // per-type perm tests + BH: the explode still rides the (type,
      // day) table; ranking windows on |types| rows only
      "perm_fdr" -> (e => operators.Stats.permFdr(e).count()),
      // |days| pseudo-values off one day reduction; exact centered sum
      "jackknife_ratio" -> (e => operators.Stats.jackknifeRatio(e).count()),
      // one stack unpivot (4x rows in flight, combinable) into the
      // 64-register sketch — register tables stay 64x|cols| forever
      "hll_calibration" -> (e => operators.Profiling.hllCalibration(e).count()),
      // one user_id lag window (same shuffle the session ops pay) to
      // |types| exact moment rows
      "event_gaps" -> (e => operators.Funnel.eventGapCensus(e).count()),
      // five exact moments off one user_id reduction; 1-row IEEE tail
      "ratio_ci" -> (e => operators.Stats.ratioCi(e).count()),
      // day-table median + one day-ordered lag window; facts reduce
      // before any ordering
      "runs_test" -> (e => operators.Stats.runsTest(e).count()))

    def sweep(name: String, base: DataFrame, big: DataFrame,
              fns: Seq[(String, DataFrame => Long)]): Seq[String] =
      fns.flatMap { case (op, fn) =>
        val (n1, s1) = time(fn(base))
        val (nF, sF) = time(fn(big))
        val ratio = if (s1 > 0) sF / s1 else 0.0
        Seq(f"""{"op":"$op","input":"$name","rows_1x":$n1,"sec_1x":$s1%.2f,"rows_${factor}x":$nF,"sec_${factor}x":$sF%.2f,"time_ratio":$ratio%.1f}""")
      }

    val ev1 = Tables.events(spark, sfDir)
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .localCheckpoint()
    val evF = replicateEvents(ev1, factor).localCheckpoint()

    val lines = sweep("documents", docs1, docsF, keep(ops)) ++
      sweep("embeddings", vecs1, vecsF, keep(vecOps)) ++
      sweep("events", ev1, evF, keep(eventOps))
    lines.foreach(println)
    println(s"""{"demo":"scale_sweep","factor":$factor,"docs_1x":${docs1.count()},"docs_${factor}x":${docsF.count()}}""")
    spark.stop()
  }
}
