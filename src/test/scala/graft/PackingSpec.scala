package graft

import org.apache.spark.sql.functions._

import operators.{Contamination, Packing}

class PackingSpec extends SparkSpec {
  import spark.implicits._

  private def doc(id: Long, words: Int, lang: String = "en") =
    (id, (1 to words).map(i => s"w$i").mkString(" "), lang)

  test("packing conserves tokens and starts a new batch when the budget fills") {
    val df = Seq(doc(1, 300), doc(2, 300), doc(3, 300))
      .toDF("doc_id", "text", "lang")
    val got = Packing.seqPacking(df, "lang", 512).orderBy("batch")
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    // doc1 starts at 0 -> batch 0; doc2 starts at 300 -> batch 0;
    // doc3 starts at 600 -> batch 1
    assert(got.toSeq == Seq((0L, 2L, 600L), (1L, 1L, 300L)))
    assert(got.map(_._3).sum == 900L, "token totals must be conserved")
  }

  test("chunking covers every token with stride overlap and truncated tail") {
    val df = Seq(doc(1, 45)).toDF("doc_id", "text", "lang")
    val got = Packing.chunkWindows(df, 32, 24).orderBy("chunk_id")
      .select("chunk_start", "chunk_len", "chunk_text").collect()
    assert(got.length == 2)
    assert((got(0).getLong(0), got(0).getLong(1)) == (0L, 32L))
    assert((got(1).getLong(0), got(1).getLong(1)) == (24L, 21L))
    assert(got(0).getString(2).startsWith("w1 ") &&
      got(1).getString(2).endsWith(" w45"))
    // short doc -> exactly one full-length chunk; empty doc -> none
    val short = Packing.chunkWindows(
      Seq(doc(2, 5)).toDF("doc_id", "text", "lang"), 32, 24).collect()
    assert(short.length == 1 && short.head.getAs[Long]("chunk_len") == 5L)
    val empty = Packing.chunkWindows(
      Seq((3L, "", "en")).toDF("doc_id", "text", "lang"), 32, 24)
    assert(empty.count() == 0L)
  }

  test("contamination is 1.0 for an eval doc duplicated in train, 0 for unique text") {
    val docs = Tables.documents(spark, sf("sf0.01"))
    val rep = Contamination.contaminationReport(docs, 10)
    val ratios = rep.agg(min("overlap_ratio"), max("overlap_ratio"))
      .collect().head
    assert(ratios.getDouble(0) >= 0.0 && ratios.getDouble(1) <= 1.0)
    // overlap counts can never exceed the doc's shingle count
    assert(rep.where(col("n_overlap") > col("n_shingles")).count() == 0)
    // the synthetic corpus has heavy cross-doc duplication, so SOME eval
    // doc must be fully covered by train shingles
    assert(rep.where(col("overlap_ratio") === 1.0).count() > 0)
  }

  test("chunk dedup: an exact duplicate doc keeps nothing, the original everything") {
    val docs = Seq(
      (0L, "a b c d e f", "en"),
      (1L, "a b c d e f", "en"), // byte-identical -> every chunk duplicated
      (2L, "p q r s t u", "en")
    ).toDF("doc_id", "text", "lang")
    val out = Packing.chunkDedup(docs, 3, 3).orderBy("doc_id")
      .as[(Long, Long, Long, Double)].collect()
    assert(out(0) === (0L, 2L, 2L, 0.0))
    assert(out(1) === (1L, 2L, 0L, 1.0))
    assert(out(2) === (2L, 2L, 2L, 0.0))
  }

  test("chunk dedup: a within-doc repeated window counts as one canonical chunk") {
    val docs = Seq((0L, "x y z x y z", "en")).toDF("doc_id", "text", "lang")
    val out = Packing.chunkDedup(docs, 3, 3).as[(Long, Long, Long, Double)].head()
    assert(out === (0L, 2L, 1L, 0.5))
  }

  test("cdc chunks: contiguous, exhaustive, consecutive ids per doc") {
    val docs = Tables.documents(spark, sf("sf0.001"))
    val out = Packing.cdcChunks(docs, 8).orderBy("doc_id", "chunk_id")
      .as[(Long, Long, Long, Int, Int)].collect()
    val totalToks = docs
      .select(expr("size(filter(split(text, '[ \\t\\n\\r\\f]+'), x -> x != ''))")
        .cast("long").as("nt"))
      .agg(sum("nt")).collect().head.getLong(0)
    assert(out.map(_._3).sum === totalToks, "chunks must partition every token")
    out.groupBy(_._1).values.foreach { cs =>
      val sorted = cs.sortBy(_._2)
      assert(sorted.map(_._2).toSeq === sorted.indices.map(_.toLong),
        "chunk ids must be consecutive from 0")
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(b._4 === a._5 + 1, "chunks must be contiguous")
        case _ =>
      }
      sorted.foreach(c => assert(c._3 === c._5 - c._4 + 1))
    }
  }

  test("cdc chunks: boundaries are edit-stable — a prefix edit only reshapes chunk 0") {
    val toks = ('a' to 'z').map(_.toString)
    val orig = Seq((0L, toks.mkString(" "), "en")).toDF("doc_id", "text", "lang")
    val edited = Seq((0L, ("zz1 zz2 " + toks.mkString(" ")), "en"))
      .toDF("doc_id", "text", "lang")
    def lens(df: org.apache.spark.sql.DataFrame) =
      Packing.cdcChunks(df, 8).orderBy("chunk_id")
        .as[(Long, Long, Long, Int, Int)].collect().map(_._3).toList
    val (a, b) = (lens(orig), lens(edited))
    assert(a.length >= 2, "need at least one content boundary for the property")
    assert(a.tail === b.tail,
      "all chunks after the first must survive a prefix insertion unchanged")
  }

  test("chunk dedup conservation: kept chunks across docs = distinct chunk contents") {
    val docs = Tables.documents(spark, sf("sf0.001"))
    val out = Packing.chunkDedup(docs, 3, 3)
    val keptSum = out.agg(sum("n_kept")).collect().head.getLong(0)
    val distinctChunks = Packing.chunkWindows(docs, 3, 3)
      .select(countDistinct("chunk_text")).collect().head.getLong(0)
    assert(keptSum === distinctChunks)
    assert(out.where(col("n_kept") > col("n_chunks")).count() === 0)
  }

  test("y8 dup-ngram rate: duplicated docs expose 1.0, unique text 0.0") {
    val docs = Seq(
      (0L, "w x y z q r s"),
      (1L, "w x y z q r s"),          // exact dup of 0 -> every shingle shared
      (2L, "totally unique words never repeated anywhere else")
    ).toDF("doc_id", "text")
    val got = Contamination.dupNgramRate(docs).orderBy("doc_id")
      .as[(Long, Long, Long, Double)].collect().toList
    assert(got(0) === ((0L, 5L, 5L, 1.0)))
    assert(got(1) === ((1L, 5L, 5L, 1.0)))
    assert(got(2) === ((2L, 5L, 0L, 0.0)))
  }

  test("y10 pack fill: batch count, overfull count and fill rate by hand") {
    // budget 4; shard 'a': docs of 2,2,5,1 tokens -> batches (cum-n)//4:
    // doc0 cum2 b0, doc1 cum4 b0, doc2 cum9 b1, doc3 cum10 b2
    // batch sums: b0=4, b1=5 (overfull), b2=1; fill = 10/(3*4)
    val docs = Seq(
      (0L, "t t", "a"), (1L, "t t", "a"),
      (2L, "t t t t t", "a"), (3L, "t", "a"))
      .toDF("doc_id", "text", "lang")
    val r = Packing.packFill(docs, "lang", 4).collect().head
    assert(r.getAs[Long]("n_batches") == 3L)
    assert(r.getAs[Long]("total_tokens") == 10L)
    assert(r.getAs[Long]("n_overfull") == 1L)
    assert(r.getAs[Double]("fill_rate") == 0.833333333)
  }

  test("y11 dedup savings: duplicated chunks charge the copier, credit the owner") {
    // chunks of 3 tokens, stride 3: doc 0 (src a) owns "x y z"; doc 1
    // (src b) repeats it -> b saves its full occurrence, a saves nothing
    val docs = Seq(
      (0L, "x y z", "a"), (1L, "x y z", "b"))
      .toDF("doc_id", "text", "source")
    val m = Packing.dedupSavings(docs, 3, 3).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_chunks"), r.getAs[Long]("n_canonical"),
          r.getAs[Long]("saved_bytes"), r.getAs[Double]("save_share"))).toMap
    assert(m("a") == (1L, 1L, 0L, 0.0))
    assert(m("b") == (1L, 0L, 5L, 1.0), "5 bytes of 'x y z' saved entirely")
  }

  test("y12 truncation ladder: per-limit overflow docs and tokens lost") {
    // token counts 2 / 200 / 600 (n_tokens 802)
    val docs = Seq(
      (0L, "a b"), (1L, Seq.fill(200)("w").mkString(" ")),
      (2L, Seq.fill(600)("w").mkString(" ")))
      .toDF("doc_id", "text")
    val m = Packing.truncationLadder(docs).collect()
      .map(r => r.getAs[Long]("context_len") ->
        (r.getAs[Long]("n_truncated_docs"), r.getAs[Long]("tokens_lost"))).toMap
    assert(m == Map(128L -> (2L, 544L), 512L -> (1L, 88L),
      2048L -> (0L, 0L)))
  }

  test("shuffle quality: exact expectation and bounded same-rate") {
    import spark.implicits._
    val docs = (1L to 40L).map(i =>
      (i, "t", if (i % 2 == 0) "A" else "B")).toDF("doc_id", "text", "source")
    val r = Packing.shuffleQuality(docs).collect().head
    // 20+20 docs: expectation = (20*19 + 20*19) / (40*39)
    val exp = (20.0 * 19 + 20.0 * 19) / (40.0 * 39)
    assert(r.getAs[Double]("expected_rate") == math.floor(exp * 1e6 + 0.5) / 1e6)
    val same = r.getAs[Double]("same_rate")
    assert(same >= 0.0 && same <= 1.0)
    assert(r.getAs[Long]("n_pairs") <= 39L, "pairs only within shards")
    // determinism of the md5 order
    assert(Packing.shuffleQuality(docs).collect().head == r)
  }

  test("shard balance: conservation and imbalance bounds on a uniform corpus") {
    import spark.implicits._
    val docs = (1L to 40L).map(i => (i, "w x y z")).toDF("doc_id", "text")
    val r = Packing.shardBalance(docs).collect().head
    assert(r.getAs[Long]("n_docs") == 40L)
    assert(r.getAs[Long]("n_tokens") == 160L)
    assert(r.getAs[Long]("n_shards") <= 32L)
    assert(r.getAs[Long]("min_shard_tokens") <= r.getAs[Long]("max_shard_tokens"))
    assert(r.getAs[Double]("imbalance") >= 1.0)
    // determinism: the md5 routing gives identical censuses on re-run
    val again = Packing.shardBalance(docs).collect().head
    assert(r == again)
  }

  test("budget mix: quality-best source fills first, boundary take is partial") {
    import spark.implicits._
    // source A: 6 docs x 10 tokens, half stopwords -> quality 0.3
    // source B: 4 docs x 10 tokens, no stopwords  -> quality 0.05
    // budget = (60+40)/2 = 50 -> A takes 50/60 partially, B takes 0
    val aText = "the the the the the cat dog fox hen owl"
    val bText = "cat dog fox hen owl bat cow pig ram ewe"
    val docs = ((1 to 6).map(i => (i.toLong, aText, "A")) ++
      (7 to 10).map(i => (i.toLong, bText, "B")))
      .toDF("doc_id", "text", "source")
      .selectExpr("doc_id", "text", "source", "'en' as lang",
        "length(text) as n_chars")
    val rows = Packing.budgetMix(docs).collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("A", "B"), "quality order")
    val byS = rows.map(r => r.getString(0) -> r).toMap
    assert(byS("A").getAs[Double]("mean_quality") == 0.3)
    assert(byS("A").getAs[Long]("tokens") == 60L)
    assert(byS("A").getAs[Long]("take_tokens") == 50L)
    assert(byS("A").getAs[Double]("take_frac") == 0.833333)
    assert(byS("B").getAs[Long]("take_tokens") == 0L)
    assert(byS("B").getAs[Double]("take_frac") == 0.0)
  }

  test("y16 fill ladder: per-budget batches/overfull by hand; token totals invariant") {
    // one shard, docs of 3,3,3 tokens; ladder {4, 8}:
    //  budget 4: batches (cum-n)//4 -> 0,0,1; sums b0=6 (overfull), b1=3
    //  budget 8: all in batch 0 -> one batch of 9 (overfull)
    val docs = Seq(
      (0L, "t t t", "a"), (1L, "t t t", "a"), (2L, "t t t", "a"))
      .toDF("doc_id", "text", "lang")
    val rows = Packing.packFillLadder(docs, "lang", Seq(4, 8)).collect()
      .map(r => r.getAs[Long]("budget") -> r).toMap
    val b4 = rows(4L); val b8 = rows(8L)
    assert(b4.getAs[Long]("n_batches") == 2L)
    assert(b4.getAs[Long]("n_overfull") == 1L)
    assert(b4.getAs[Double]("fill_rate") == 1.125) // 9 / (2*4)
    assert(b8.getAs[Long]("n_batches") == 1L)
    assert(b8.getAs[Long]("n_overfull") == 1L)
    assert(b8.getAs[Double]("fill_rate") == 1.125) // 9 / 8
    // every ladder rung packs the same corpus: token totals invariant
    assert(rows.values.map(_.getAs[Long]("total_tokens")).toSet == Set(9L))
  }
}
