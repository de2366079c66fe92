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
}
