package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private def vecs = Tables.embeddings(spark, sf("sf0.001"))

  test("cosine top-k: similarities in [-1,1], descending per query, k rows") {
    val top = Similarity.cosineTopK(vecs, 3, 5)
      .orderBy("q_id", "rank")
      .as[(Long, Long, Int, Double)].collect()
    assert(top.length === 15)
    top.groupBy(_._1).values.foreach { rows =>
      val sims = rows.sortBy(_._3).map(_._4)
      assert(sims.zip(sims.tail).forall { case (a, b) => a >= b })
      assert(sims.forall(s => s >= -1.0001 && s <= 1.0001))
    }
  }

  test("a vector is its own nearest neighbor when not excluded (sanity)") {
    // cosine of a vector with itself under fixed-point quantization ≈ 1
    val base = vecs.limit(1)
    val doubled = base.union(base.withColumn("vec_id", col("vec_id") + 1000))
    val top = Similarity.cosineTopK(doubled, 1, 1).as[(Long, Long, Int, Double)].head()
    assert(top._2 === 1000L)
    assert(math.abs(top._4 - 1.0) < 1e-6)
  }

  test("LSH buckets are deterministic bit-strings of plane count") {
    val b = Similarity.lshBuckets(vecs, 4).as[(Long, String)].collect()
    assert(b.forall(_._2.matches("[01]{4}")))
    val again = Similarity.lshBuckets(vecs, 4).as[(Long, String)].collect()
    assert(b.toMap === again.toMap)
  }

  test("kNN label vote returns one prediction per query") {
    val preds = Similarity.knnLabelVote(vecs, 5, 5).as[(Long, Int, Long)].collect()
    assert(preds.map(_._1).toSet === Set(0L, 1L, 2L, 3L, 4L))
  }

  test("ann recall is a valid per-query ratio and deterministic") {
    val r = Similarity.annRecall(vecs, 4, 10, 3)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getDouble(2)))
    assert(r.length == 10)
    r.foreach { case (q, hits, rec) =>
      assert(hits >= 0 && hits <= 3, s"q$q hits=$hits")
      assert(math.abs(rec - hits / 3.0) < 1e-5, s"q$q recall=$rec hits=$hits")
    }
    val r2 = Similarity.annRecall(vecs, 4, 10, 3)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getDouble(2)))
    assert(r.toSeq == r2.toSeq, "recall measurement must be reproducible")
  }
}
