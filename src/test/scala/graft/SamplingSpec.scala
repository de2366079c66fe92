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
}
