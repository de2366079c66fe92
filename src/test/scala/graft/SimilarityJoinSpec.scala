package graft

import org.apache.spark.sql.functions._

import operators.{Dedup, SimilarityJoin}

class SimilarityJoinSpec extends SparkSpec {
  import spark.implicits._

  test("threshold join keeps >= t pairs and drops the rest") {
    val docs = Seq(
      (1L, "a b c d e f"), // shingles {abc,bcd,cde,def}
      (2L, "a b c d e g"), // shares 3 of 5 union -> J = 0.6
      (3L, "z y x w v u"), // disjoint
      (4L, "a b c d e f")) // identical to 1 -> J = 1.0
      .toDF("doc_id", "text")
    val got = SimilarityJoin.jaccardThresholdJoin(docs, 0.5)
      .orderBy("doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq == Seq((1L, 2L, 0.6), (1L, 4L, 1.0), (2L, 4L, 0.6)))
  }

  test("prefix filtering is lossless vs the naive join on real data") {
    val docs = Tables.documents(spark, sf("sf0.001"))
    val fast = SimilarityJoin.jaccardThresholdJoin(docs, 0.5)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // naive: full inverted-index join, no pruning
    val ss = Dedup.shingleHashRows(docs).distinct()
    val sz = ss.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val naive = ss.as("x").join(ss.as("y"),
        col("x.sh_h") === col("y.sh_h") && col("x.doc_id") < col("y.doc_id"))
      .groupBy(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("i"))
      .join(sz.select(col("doc_id").as("doc_a"), col("n").as("na")), "doc_a")
      .join(sz.select(col("doc_id").as("doc_b"), col("n").as("nb")), "doc_b")
      .where(col("i").cast("double") /
        (col("na") + col("nb") - col("i")).cast("double") >= 0.5)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(fast == naive,
      s"missing=${naive -- fast} extra=${fast -- naive}")
  }

  test("document frequency is a groupBy, never a whole-partition window on sh_h") {
    // A Window.partitionBy(sh_h) count serializes every row of a hot
    // shingle into one task (a stopword 3-shingle has df ~10^8 on a web
    // corpus); the df column must come from a map-side-combinable
    // aggregate instead. Audit the lazy plan: the only window partition
    // keys allowed are doc_id (bounded by document length).
    val ss = Dedup.shingleHashRows(
      Seq((1L, "a b c d e"), (2L, "a b c x y")).toDF("doc_id", "text"))
      .distinct()
    val p = SimilarityJoin.prefixJoin(ss, 0.5)
      .queryExecution.optimizedPlan.toString
    val windowParts = "windowspecdefinition\\((\\w+)#".r
      .findAllMatchIn(p).map(_.group(1)).toSet
    assert(windowParts.subsetOf(Set("doc_id")), s"window keys: $windowParts")
  }

  test("one artificially hot shingle: correct under skew") {
    // 200 docs all sharing the same hot 3-shingle prefix ("x y z"), each
    // with a unique tail -> the hot shingle's df is 200x any other; pairs
    // must still be exactly the identical-doc pairs. With the old
    // whole-partition window this shape funneled 200 rows + every other
    // computation of that shingle into one task; with groupBy df it
    // stays partial-aggregated. Two identical docs are planted.
    val docs = (1 to 200).map { i =>
      val tail = if (i <= 2) "dup dup dup dup" else s"t$i u$i v$i w$i"
      (i.toLong, s"x y z $tail")
    }.toDF("doc_id", "text")
    val got = SimilarityJoin.jaccardThresholdJoin(docs, 0.5)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 2L)), s"got $got")
  }

  test("g14 quality census: counts consistent, ratios valid, recall 1 on cliques") {
    // identical docs ALWAYS collide in every band (equal signatures), so
    // banded LSH cannot miss an identical pair — recall must be exactly 1
    // on a corpus whose only true pairs are identical-doc pairs
    val docs = ((1 to 3).map(i => (i.toLong, "alpha beta gamma delta epsilon")) ++
      (4 to 60).map(i => (i.toLong, s"x$i y$i z$i w$i v$i u$i")))
      .toDF("doc_id", "text")
    val r = SimilarityJoin.minhashQuality(docs, 4, 0.5).head()
    val (nCand, nTrue, nTp) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(nTrue === 3L, s"3 identical docs = 3 true pairs, got $nTrue")
    assert(nTp === nTrue, "every identical pair must be a candidate (recall 1)")
    assert(nTp <= nCand)
    assert(r.getDouble(4) === 1.0)
    assert(r.getDouble(3) > 0.0 && r.getDouble(3) <= 1.0)
  }

  test("verify strategy: broadcast / shuffle / sliced plans are answer-identical; auto decides from measured bytes") {
    val ss = Dedup.shingleHashRows(Tables.documents(spark, sf("sf0.001")))
      .distinct()
    def pairs(slices: Int, bcast: Option[Boolean]) =
      SimilarityJoin.prefixJoinSliced(ss, 0.5, slices, bcast)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .toSet
    val shuffle = pairs(1, Some(false))
    assert(shuffle.nonEmpty)
    assert(pairs(1, Some(true)) === shuffle)
    assert(pairs(1, None) === shuffle)
    assert(pairs(3, Some(true)) === shuffle)
    // the estimate is a sane upper-bound shape: 8 B/posting + 32 B/doc
    val est = SimilarityJoin.docSetsBytesEstimate(ss)
    val postings = ss.count()
    assert(est >= 8L * postings && est <= 8L * postings + 64L * postings)
    // plan identity: the lever OFF is the historic unhinted plan (no
    // broadcast join on the verify side); ON broadcasts both set tables
    // at toy scale the planner broadcasts the tiny sides anyway, so the
    // physical plans coincide — pin the DECISION at the analyzed plan,
    // where the hint is an explicit ResolvedHint node (at sf10 the hint
    // is the measured difference between finishing and disk death)
    def hinted(bcast: Option[Boolean]) =
      SimilarityJoin.prefixJoinSliced(ss, 0.5, 1, bcast)
        .queryExecution.analyzed.toString.contains("ResolvedHint")
    assert(!hinted(Some(false)), "lever OFF must build the unhinted plan")
    assert(hinted(Some(true)), "lever ON must hint both verify sides")
    // at test scale the estimate is far under the ceiling, so AUTO must
    // pick the broadcast plan — the sf10-measured decision, made by code
    assert(est <= SimilarityJoin.Y4BroadcastMaxBytes)
    assert(hinted(None), "auto under the ceiling must take the broadcast plan")
  }

  test("sliced verify (the sf10 transient-disk lever) equals the single-shot join") {
    // slicing partitions the candidate space by doc_a hash and runs one
    // bounded job per slice — the union must be bit-identical to the
    // lazy single-shot plan on real data
    val ss = Dedup.shingleHashRows(Tables.documents(spark, sf("sf0.001")))
      .distinct()
    def pairs(slices: Int) =
      SimilarityJoin.prefixJoinSliced(ss, 0.5, slices)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .toSet
    val single = pairs(1)
    assert(single.nonEmpty, "fixture must produce qualifying pairs")
    assert(pairs(4) === single)
    assert(pairs(3) === single)
  }
}
