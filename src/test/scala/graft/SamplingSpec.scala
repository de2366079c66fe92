package graft

import org.apache.spark.sql.functions._

import operators.Sampling

class SamplingSpec extends SparkSpec {
  private def docs = Tables.documents(spark, sf("sf0.001"))

  test("hash sample is deterministic and a strict subset at a lower rate") {
    val s10 = Sampling.hashSample(docs, 10).select("doc_id").collect().map(_.getLong(0)).toSet
    val s10b = Sampling.hashSample(docs, 10).select("doc_id").collect().map(_.getLong(0)).toSet
    val s50 = Sampling.hashSample(docs, 50).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(s10 == s10b, "same rate must reproduce the identical sample")
    assert(s10.subsetOf(s50), "raising the rate must only add rows")
    assert(Sampling.hashSample(docs, 100).count() == docs.count())
  }

  test("stratified sample takes at most n per stratum, ranked 1..n") {
    val s = Sampling.stratifiedSample(docs, "lang", 5)
      .groupBy("lang").agg(count(lit(1)).as("n"), max("rank").as("mr"), min("rank").as("lo"))
      .collect()
    s.foreach { r =>
      assert(r.getLong(1) <= 5 && r.getInt(2) <= 5 && r.getInt(3) == 1,
        s"stratum ${r.getString(0)} violated the top-n contract: $r")
    }
  }

  test("stratified sample is invariant to the salt count (two-phase = one-phase)") {
    def draw(salts: Int) = Sampling.stratifiedSample(docs, "lang", 7, salts)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
    assert(draw(1) == draw(64),
      "the salted pre-prune must not change the selected sample")
  }

  test("mixture: integer factors copy exactly, zero factors drop, halves bound") {
    val out = Sampling.mixture(docs, "lang",
      Seq(("en", 2, 1), ("de", 1, 2), ("fr", 0, 1)))
    val perLang = out.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val census = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(perLang("en") == 2 * census("en"), "2x = exactly two epochs per doc")
    assert(!perLang.contains("fr"), "zero weight drops the group entirely")
    assert(perLang.getOrElse("de", 0L) <= census("de"),
      "0.5x emits at most one copy per doc")
    // every emitted (doc, epoch) pair is unique — copies are addressable
    assert(out.count() == out.distinct().count())
  }

  test("mixture is deterministic across invocations (no rand())") {
    def draw() = Sampling.mixture(docs, "lang", Seq(("en", 3, 2), ("de", 1, 4)))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(draw() == draw())
  }

  test("split is exhaustive and disjoint: per-lang split sizes sum to the census") {
    val total = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val bySplit = Sampling.splitCounts(docs).groupBy("lang")
      .agg(sum("n_docs").as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySplit == total, "every doc must land in exactly one split")
  }

  test("psi drift: finite contributions, bounded bins, no drift on a hash split") {
    import spark.implicits._
    val out = Sampling.psiDrift(docs).orderBy("bin")
      .as[(Long, Long, Long, Double)].collect()
    assert(out.forall(r => r._1 >= 0 && r._1 <= 9))
    assert(out.forall(r => !r._4.isNaN && !r._4.isInfinite),
      "smoothing must keep every term finite even for empty-side bins")
    assert(out.forall(_._4 >= -1e-12), "PSI terms are non-negative by construction")
    // a uniform hash split can't drift: total PSI far below the 0.2 alarm
    val psi = out.map(_._4).sum
    assert(psi < 0.2, s"hash-split PSI should be ~0, got $psi")
    val again = Sampling.psiDrift(docs).orderBy("bin")
      .as[(Long, Long, Long, Double)].collect() // deterministic across runs
    assert(out.toSeq === again.toSeq)
  }

  test("weighted sample: deterministic, size-bounded, biased toward weight") {
    val a = Sampling.weightedSample(docs, "n_chars", 25).collect()
    val b = Sampling.weightedSample(docs, "n_chars", 25).collect()
    assert(a.toSeq == b.toSeq)
    assert(a.length === 25)
    // Efraimidis-Spirakis inclusion scales with weight: the sampled mean
    // weight must exceed the corpus mean (deterministic on fixed data)
    val sampleMean = a.map(_.getAs[Long]("w")).sum.toDouble / a.length
    val corpusMean = docs.agg(avg("n_chars")).collect().head.getDouble(0)
    assert(sampleMean > corpusMean,
      s"weighted sample mean $sampleMean <= corpus mean $corpusMean")
  }

  test("weighted sample: a dominating weight is always drawn, w<=0 never") {
    import spark.implicits._
    val tiny = (1L to 100L).map(i => (i, 10L)).toDF("doc_id", "wt")
      .union(Seq((1000L, 100000000L), (2000L, 0L), (3000L, -5L))
        .toDF("doc_id", "wt"))
    val got = Sampling.weightedSample(tiny, "wt", 5)
      .select("doc_id").as[Long].collect().toSet
    assert(got.contains(1000L), "the ~10^7x heavier row must be sampled")
    assert(!got.contains(2000L) && !got.contains(3000L))
  }

  test("x17 bootstrap CI brackets the mean and is deterministic") {
    val a = Sampling.bootstrapCI(docs).collect().head
    val b = Sampling.bootstrapCI(docs).collect().head
    assert(a == b, "bootstrap must be fully deterministic")
    val (sm, bm, lo, hi) = (a.getDouble(1), a.getDouble(2),
      a.getDouble(3), a.getDouble(4))
    assert(lo < hi, "a 95% CI on noisy data has positive width")
    assert(lo <= bm && bm <= hi, "boot mean lies inside its own CI")
    assert(lo <= sm && sm <= hi,
      "the full-sample mean should fall inside the bootstrap CI")
  }

  test("x17 bootstrap CI collapses on a constant column") {
    import spark.implicits._
    val const = (1L to 200L).map(i => (i, 42L)).toDF("doc_id", "n_chars")
    val r = Sampling.bootstrapCI(const).collect().head
    assert(r.getDouble(2) === 42.0 && r.getDouble(3) === 42.0 &&
      r.getDouble(4) === 42.0,
      "every replicate mean of a constant is the constant")
  }

  test("x18 temperature mix: α=1 is the natural mix at the target rate") {
    val r = Sampling.temperatureMix(docs, alpha = 1.0).collect()
    r.foreach { row =>
      assert(math.abs(row.getDouble(2) - row.getDouble(3)) <= 2e-6,
        s"α=1 must keep q=p for ${row.getString(0)}")
      assert(math.abs(row.getDouble(4) - 0.5) <= 2e-6,
        "α=1 at targetFrac=0.5 keeps exactly half of every language")
    }
  }

  test("x18 temperature mix: α<1 upsamples tail languages") {
    val rows = Sampling.temperatureMix(docs, alpha = 0.3).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(4), r.getLong(5)))
    val byN = rows.sortBy(_._2)
    // keep_rate must be non-increasing in language size
    byN.sliding(2).foreach { case Array(small, big) =>
      assert(small._3 >= big._3 - 1e-9,
        s"rarer ${small._1} must keep at a rate >= ${big._1}")
    }
    rows.foreach { case (lang, n, _, k) =>
      assert(k <= n, s"$lang sampled more rows than it has") }
  }
}
