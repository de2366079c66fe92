package graft

import org.apache.spark.sql.functions._

import operators.KMeans

class KMeansSpec extends SparkSpec {

  private lazy val step = KMeans.kmeansStep(
    Tables.embeddings(spark, sf("sf0.01")), 6)

  test("every vector is assigned: per-dim membership sums to the corpus size") {
    val total = Tables.embeddings(spark, sf("sf0.01")).count()
    val byDim = step.groupBy("dim").agg(sum("n_members").as("n"))
      .select("n").distinct().collect()
    assert(byDim.length == 1 && byDim.head.getLong(0) == total,
      "every dimension must see every vector exactly once")
  }

  test("output covers k centroids x 64 dims with means inside the fixed-point range") {
    val rows = step.collect()
    assert(rows.length == 6 * 64)
    // fixed-point scale is 1e5 on values in (-1, 1) -> means within 1e5
    rows.foreach { r =>
      val m = r.getAs[Double]("mean_fp")
      assert(math.abs(m) <= 100000.0, s"mean out of range: $r")
    }
  }

  test("centroid shift is zero when every cluster is exactly its seed") {
    import spark.implicits._
    // 3 mutually-orthogonal vectors, k = 3: each is its own centroid and
    // sole member, so the updated mean IS the seed -> shift 0
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f), 0),
      (1L, Array(0.0f, 1.0f, 0.0f), 1),
      (2L, Array(0.0f, 0.0f, 1.0f), 2))
      .toDF("vec_id", "embedding", "label")
    val rows = KMeans.kmeansShift(vecs, 3).collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_members") == 1L)
      assert(r.getAs[Double]("shift") == 0.0, s"nonzero shift: $r")
    }
  }

  test("inertia: self-clustered orthogonal vectors score 0; members partition") {
    import spark.implicits._
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f), 0),
      (1L, Array(0.0f, 1.0f, 0.0f), 1),
      (2L, Array(0.0f, 0.0f, 1.0f), 2))
      .toDF("vec_id", "embedding", "label")
    KMeans.kmeansInertia(vecs, 3).collect().foreach { r =>
      assert(r.getAs[Long]("n_members") == 1L)
      assert(r.getAs[Double]("inertia") == 0.0, s"self-cluster not tight: $r")
    }
    val rows = KMeans.kmeansInertia(Tables.embeddings(spark, sf("sf0.01")), 6)
      .collect()
    assert(rows.map(_.getAs[Long]("n_members")).sum ==
      Tables.embeddings(spark, sf("sf0.01")).count())
    rows.foreach(r => assert(r.getAs[Double]("inertia") >= 0.0))
  }

  test("shift census is non-negative and covers all k centroids at sf0.01") {
    val rows = KMeans.kmeansShift(Tables.embeddings(spark, sf("sf0.01")), 6)
      .collect()
    assert(rows.length == 6)
    rows.foreach(r => assert(r.getAs[Double]("shift") >= 0.0))
    assert(rows.map(_.getAs[Long]("n_members")).sum ==
      Tables.embeddings(spark, sf("sf0.01")).count())
  }
}
