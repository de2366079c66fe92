package graft

import org.apache.spark.sql.functions._

import operators.{Dedup, Pipeline}

class PipelineSpec extends SparkSpec {
  import spark.implicits._

  test("census conserves rows: kept groups' docs = survivors + removed dups") {
    val docs = Tables.documents(spark, sf("sf0.01"))
    val result = Pipeline.curate(docs, 20)
    val got = result.agg(
      sum("n_docs").as("n"), sum("dups_removed").as("d")).collect().head
    // independent recomputation of the kept groups' total membership:
    // group sizes per norm joined against the survivor detail rows (which
    // carry every bar's verdict) — census totals must match exactly
    val kept = Pipeline.curateSurvivors(docs, 20)
      .select("doc_id").as[Long].collect().toSet
    val expected = docs
      .select(col("doc_id"), Dedup.normText(col("text")).as("norm"))
      .groupBy("norm").agg(min("doc_id").as("doc_id"), count(lit(1)).as("sz"))
      .where(col("doc_id").isin(kept.toSeq: _*))
      .agg(sum("sz")).collect().head.getLong(0)
    assert(got.getLong(0) + got.getLong(1) == expected,
      s"survivors ${got.getLong(0)} + dups ${got.getLong(1)} != members $expected")
  }

  test("quality bar filters: no kept group is below the token minimum") {
    val docs = Tables.documents(spark, sf("sf0.001"))
    // with an impossible bar the census must be empty
    assert(Pipeline.curate(docs, 1000000).count() == 0)
    // with every bar disabled, each doc lands in exactly one split/lang cell
    val all = Pipeline.curate(docs, 0, maxOov = 1.0, minTtr = 0.0,
      maxTopBigram = 1.0)
    val covered = all.agg(sum("n_docs") + sum("dups_removed"))
      .collect().head.getLong(0)
    assert(covered == docs.count())
  }

  test("repetition bar bites: a degenerate spam doc is dropped, clean kept") {
    // 30 tokens of one word: ttr = 1/30, top bigram frac = 1.0 — both
    // sides of the Gopher cut fail; the varied doc passes every bar
    val clean = (1 to 30).map(i => s"w$i").mkString(" ")
    val spam = Seq.fill(30)("spam").mkString(" ")
    val docs = Seq((1L, "en", clean), (2L, "en", spam))
      .toDF("doc_id", "lang", "text")
    val kept = Pipeline.curateSurvivors(docs, 20, vocabK = 100)
      .select("doc_id").as[Long].collect().toSet
    assert(kept === Set(1L))
  }

  test("OOV bar bites: a doc outside the corpus vocabulary is dropped") {
    // 40 common-word docs define the top-5 vocabulary; the outlier's
    // tokens are all unseen -> oov_ratio 1.0 > 0.2 -> dropped. Its own
    // rare words can't enter the vocab: each appears once vs 40x.
    val common = (1 to 40).map(i =>
      (i.toLong, "en", Seq.tabulate(25)(j => s"c${j % 5}").mkString(" ")))
    val outlier = (99L, "en", (1 to 25).map(j => s"rare$j").mkString(" "))
    val docs = (common :+ outlier).toDF("doc_id", "lang", "text")
    val kept = Pipeline.curateSurvivors(docs, 20, vocabK = 5,
      minTtr = 0.0, maxTopBigram = 1.0)
      .select("doc_id").as[Long].collect().toSet
    assert(!kept.contains(99L), "all-OOV outlier must fail the OOV bar")
    assert(kept.nonEmpty, "common docs must pass the OOV bar")
  }

  test("materialized pipeline equals the lazy core exactly") {
    val docs = Tables.documents(spark, sf("sf0.001"))
    val eager = Pipeline.curate(docs, 20).orderBy("split", "lang")
      .as[(String, String, Long, Long, Long)].collect().toList
    val lazyCore = Pipeline.curate(docs, 20, materialize = false)
      .orderBy("split", "lang")
      .as[(String, String, Long, Long, Long)].collect().toList
    assert(eager === lazyCore)
    assert(eager.nonEmpty)
  }

  test("joint curation census = independently intersected modality filters") {
    val docs = Tables.documents(spark, sf("sf0.001"))
    val vecs = Tables.embeddings(spark, sf("sf0.001"))
    val census = operators.MultiModalPipeline
      .jointCurate(docs, vecs, 30, 4, 0.45)
      .as[(String, Long, Long)].collect().map(r => r._1 -> r._2).toMap
    val textIds = operators.TextAnalysis.qualityScore(docs)
      .where(col("n_tokens") >= 30).select("doc_id").as[Long].collect().toSet
    val keepIds = operators.Similarity.semDedup(vecs, 4, 0.45)
      .where(col("kept") === 1).select("vec_id").as[Long].collect().toSet
    val expected = docs.select("doc_id", "lang").as[(Long, String)].collect()
      .filter(d => textIds.contains(d._1) && keepIds.contains(d._1))
      .groupBy(_._2).view.mapValues(_.length.toLong).toMap
    assert(census === expected)
    assert(census.values.sum > 0, "joint filter must keep something at sf0.001")
  }

  test("e4: full-band near-dup drops the later copy; rollup conserves docs") {
    import spark.implicits._
    val docs = Seq(
      (0L, "spark makes big data small again and again and again", "en", "s", 52L),
      (1L, "spark  makes\tbig data small again and again and again", "en", "s", 53L),
      (2L, "completely different content with many unique words here", "en", "s", 57L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val run = Registry.all.find(_.name == "e4_dedup_quality").get
    // drive the kernels directly (the registry fn reads from a dir)
    val dropped = operators.Dedup.minhashNearDups(docs, 4, 4)
      .select("doc_b").as[Long].collect().toSet
    assert(dropped == Set(1L), "the ws-variant later copy must drop")
    assert(run.oracle.nonEmpty)
  }

  test("e5 yield funnel: stages are cumulative — docs and tokens only shrink") {
    val run = Registry.all.find(_.name == "e5_yield_funnel").get
    val rows = run.run(spark, sf("sf0.001")).collect()
    assert(rows.map(_.getString(0)).toSeq ==
      Seq("1_raw", "2_exact", "3_neardup", "4_quality"))
    val docs = rows.map(_.getLong(1))
    val toks = rows.map(_.getLong(2))
    docs.sliding(2).foreach(p => assert(p(0) >= p(1), docs.mkString(",")))
    toks.sliding(2).foreach(p => assert(p(0) >= p(1), toks.mkString(",")))
    assert(docs.head > 0 && docs.last >= 0)
  }
}
