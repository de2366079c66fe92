package graft

import org.apache.spark.sql.functions._

import operators.{Dedup, Packing, Sampling, TextAnalysis}

/** Null/degenerate-text behavior of the core text operators — the
  * synthetic corpus has no nulls, so these document and pin what
  * PRODUCTION data would hit. Contract: null text behaves like empty
  * text wherever tokenization defines the semantics (split(null) is
  * null → explode/posexplode drop the row), and never throws. */
class NullRobustnessSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (0L, Some("alpha beta gamma delta epsilon"), "en", 30L),
    (1L, None: Option[String], "en", 0L),
    (2L, Some(""), "en", 0L),
    (3L, Some("   \t  "), "en", 6L)
  ).toDF("doc_id", "text", "lang", "n_chars")

  test("exact dedup: null and whitespace-only texts don't crash; null groups apart") {
    val got = Dedup.exactDedup(docs).orderBy("doc_id")
      .as[(Long, Long)].collect().toList
    // norm(null)=null, norm("")=norm("  ")="" -> 2 and 3 collapse; the
    // null row forms its own group (SQL groupBy treats nulls as equal)
    assert(got === List(0L -> 1L, 1L -> 1L, 2L -> 2L))
  }

  test("token-based metrics drop token-less rows instead of throwing") {
    val q = TextAnalysis.qualityScore(docs).select("doc_id").as[Long].collect().toSet
    assert(q === Set(0L), "explode drops null/empty/whitespace docs")
    val t = TextAnalysis.tokenCounts(docs).orderBy("doc_id")
      .as[(Long, Option[Long], Option[Long])].collect().toMap2
    assert(t(0L) === ((Some(5L), Some(5L))))
    // null text propagates as NULL counts (size(split(null)) is null),
    // distinguishable downstream from a genuinely empty doc's 0
    assert(t(1L) === ((None, None)))
    assert(t(2L) === ((Some(0L), Some(0L))))
  }

  test("chunkers emit nothing for null/empty docs") {
    assert(Packing.chunkWindows(docs, 3, 3).where(col("doc_id") =!= 0).count() === 0)
    assert(Packing.cdcChunks(docs, 8).where(col("doc_id") =!= 0).count() === 0)
  }

  test("winnowing emits nothing for null/empty/whitespace docs, never throws") {
    val fps = TextAnalysis.winnowFingerprints(docs, 4)
    assert(fps.where(col("doc_id") =!= 0).count() === 0,
      "token-less docs must produce no fingerprints")
    assert(fps.where(col("doc_id") === 0).count() >= 1)
    assert(TextAnalysis.winnowCandidates(docs, 4).count() === 0,
      "a single fingerprinted doc has no candidate pairs")
  }

  test("weighted sample tolerates null weights (treated as not positive)") {
    val d = Seq((1L, Some(10L)), (2L, None: Option[Long]), (3L, Some(5L)))
      .toDF("doc_id", "wt")
    val got = Sampling.weightedSample(d, "wt", 5)
      .select("doc_id").as[Long].collect().toSet
    assert(got === Set(1L, 3L))
  }

  test("burstiness drops token-less docs; all-df-1 vocab yields empty, not a crash") {
    // only doc 0 tokenizes, so every word has df=1 -> filtered out
    assert(TextAnalysis.wordBurstiness(docs).count() === 0)
  }

  test("time-to-convert with zero converters: null mean/median, zero counts, no throw") {
    val ev = Seq((1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 1L, "view"))
      .toDF("event_id", "ts", "user_id", "event_type")
    val r = operators.Funnel.timeToConvert(ev).collect().head
    assert(r.getAs[Long]("n_from") === 0L)
    assert(r.getAs[Long]("n_converted") === 0L)
    assert(r.isNullAt(r.fieldIndex("avg_delta_sec")))
    assert(r.isNullAt(r.fieldIndex("p50_delta_min")))
  }

  test("mann-whitney with one empty group: exact u_a=0, null z, no ANSI crash") {
    val ev = Seq(("purchase", 1.00), ("purchase", 2.00)).toDF("event_type", "value")
    val r = operators.Stats.mannWhitneyU(ev).collect().head
    assert(r.getAs[Long]("n_a") === 0L && r.getAs[Long]("n_b") === 2L)
    assert(r.getAs[Double]("u_a") === 0.0)
    assert(r.isNullAt(r.fieldIndex("z")))
  }

  private implicit class Map2[A, B, C](rows: Array[(A, B, C)]) {
    def toMap2: Map[A, (B, C)] = rows.map(r => r._1 -> ((r._2, r._3))).toMap
  }
}
