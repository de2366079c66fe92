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
}
