package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, TextAnalysis}

/** Winnowing fingerprint selection (t15) — the SIGMOD'03 guarantees the
  * operator's contract rests on, proven on constructed documents:
  * coverage (every full window contributes a selected fingerprint),
  * the match guarantee (documents sharing a run of >= w+2 tokens share
  * a fingerprint), density (far fewer fingerprints than shingles), and
  * the short-document fallback.
  */
class WinnowSpec extends SparkSpec {
  import spark.implicits._

  private val W = 4

  private def docsDF(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")

  test("coverage: every full window of w shingles contains a selection") {
    val docs = docsDF(
      0L -> "one two three four five six seven eight nine ten eleven twelve")
    val fps = TextAnalysis.winnowFingerprints(docs, W)
      .select("fp_pos").as[Int].collect().toSet
    val nShingles = Dedup.shinglePosRows(docs).count().toInt
    // window starting at every pos p in [1, n-w+1] must contain a selected
    // position within [p, p+w-1]
    (1 to nShingles - W + 1).foreach { p =>
      assert((p until p + W).exists(fps.contains),
        s"window at $p has no selected fingerprint")
    }
  }

  test("match guarantee: docs sharing a run of w+2 tokens share a fingerprint") {
    // shared run of W+2 = 6 tokens => W = 4 consecutive shared shingles
    // => one full window inside the run => a common fingerprint hash
    val shared = "alpha beta gamma delta epsilon zeta"
    val docs = docsDF(
      0L -> s"aa bb cc dd $shared ee ff gg hh",
      1L -> s"xx yy $shared zz ww vv uu tt ss rr")
    val byDoc = TextAnalysis.winnowFingerprints(docs, W)
      .select("doc_id", "fp").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert((byDoc(0L) intersect byDoc(1L)).nonEmpty,
      "shared 6-token run produced no common fingerprint")
  }

  test("density: selected fingerprints are a strict subset of shingles") {
    val text = (1 to 200).map(i => s"w${i % 97}").mkString(" ")
    val docs = docsDF(0L -> text)
    val nSel = TextAnalysis.winnowFingerprints(docs, W).count()
    val nSh = Dedup.shinglePosRows(docs).count()
    assert(nSel < nSh, s"winnowing selected $nSel of $nSh shingles")
    // expected density 2/(w+1) = 0.4; allow generous slack both ways
    assert(nSel.toDouble / nSh > 0.1 && nSel.toDouble / nSh < 0.7)
  }

  test("short docs (< w shingles) still get exactly one fingerprint") {
    val docs = docsDF(
      0L -> "just three tokens",     // 1 shingle
      1L -> "now four tokens here",  // 2 shingles
      2L -> "a b")                   // 0 shingles — no row
    val got = TextAnalysis.winnowFingerprints(docs, W)
      .groupBy("doc_id").agg(count(lit(1)).as("n"))
      .as[(Long, Long)].collect().toMap
    assert(got === Map(0L -> 1L, 1L -> 1L))
  }

  test("rightmost-min tie rule: duplicate minimal hashes pick the later position") {
    // identical shingles produce identical hashes; a doc of one repeated
    // token has all-equal hashes, so each full window selects its LAST
    // position — selections are {W, W+1, ..., n}
    val docs = docsDF(0L -> (1 to 10).map(_ => "same").mkString(" "))
    val n = Dedup.shinglePosRows(docs).count().toInt // 8 shingles
    val got = TextAnalysis.winnowFingerprints(docs, W)
      .select("fp_pos").as[Int].collect().toSet
    assert(got === (W to n).toSet)
  }

  test("y9 candidates: shared-run docs pair up; disjoint docs never do") {
    val shared = "alpha beta gamma delta epsilon zeta"
    val docs = docsDF(
      0L -> s"aa bb cc dd $shared ee ff gg hh",
      1L -> s"xx yy $shared zz ww vv uu tt ss rr",
      2L -> "completely different words with no overlap at all here")
    val pairs = TextAnalysis.winnowCandidates(docs, W)
      .as[(Long, Long, Long)].collect()
    assert(pairs.map(p => (p._1, p._2)).toSet === Set((0L, 1L)),
      s"exactly the shared-run pair must surface: ${pairs.mkString(",")}")
    assert(pairs.head._3 >= 1)
  }

  test("y9 df cap: boilerplate fingerprints above the cap emit no pairs") {
    // 5 identical docs -> every fingerprint has df 5; cap 2 excludes them
    // all, so the candidate set is EMPTY — the cap, not input luck,
    // bounds per-fingerprint emission (the g4 discipline)
    val docs = docsDF((1 to 5).map(i =>
      i.toLong -> "the same boilerplate text repeated in every document"): _*)
    assert(TextAnalysis.winnowCandidates(docs, W, dfCap = Some(2)).count() === 0L)
    assert(TextAnalysis.winnowCandidates(docs, W, dfCap = Some(5)).count() === 10L)
  }

  test("g27: identical docs score winnow-Jaccard 1.0; disjoint docs never pair") {
    val docs = docsDF(
      1L -> "alpha beta gamma delta epsilon zeta eta theta iota kappa",
      2L -> "alpha beta gamma delta epsilon zeta eta theta iota kappa",
      3L -> "one two three four five six seven eight nine ten")
    val top = TextAnalysis
      .winnowJaccardJoin(TextAnalysis.winnowFingerprints(docs, W), 10)
      .collect()
    assert(top.length === 1, top.mkString(","))
    assert(top(0).getLong(0) === 1L && top(0).getLong(1) === 2L)
    assert(top(0).getDouble(2) === 1.0)
  }

  test("g27 estimates track true containment direction: near-dups above strangers") {
    val shared = "the quick brown fox jumps over the lazy dog again and again"
    val docs = docsDF(
      1L -> s"$shared tail one two three",
      2L -> s"$shared other four five six",
      3L -> "entirely disjoint vocabulary for the control document here now")
    val rows = TextAnalysis
      .winnowJaccardJoin(TextAnalysis.winnowFingerprints(docs, W), 10)
      .collect()
    assert(rows.map(r => (r.getLong(0), r.getLong(1))).toSet === Set((1L, 2L)))
    val j = rows(0).getDouble(2)
    assert(j > 0.3 && j < 1.0, s"shared-run pair should score mid-range: $j")
  }
}
