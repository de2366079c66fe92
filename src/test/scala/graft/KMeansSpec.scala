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

  test("maximin seeds: farthest-point-first order with exact distances") {
    import spark.implicits._
    // power-of-two floats are exact in float32, so the x1e5 floor is
    // stable: 2^-13 -> 12, 2^-15 -> 3, 2^-16 -> 1.
    // s1=v0; dists 144/9/1 -> s2=v1; v2 min(9,153)=9, v3 min(1,121)=1
    // -> s3=v2; v3 min(1,10)=1 -> s4=v3
    val df = Seq(
      (0L, Array(0.0f, 0.0f), 0),
      (1L, Array(math.pow(2, -13).toFloat, 0.0f), 0),
      (2L, Array(0.0f, math.pow(2, -15).toFloat), 0),
      (3L, Array(math.pow(2, -16).toFloat, 0.0f), 0))
      .toDF("vec_id", "embedding", "label")
    val got = KMeans.maximinSeeds(df).collect()
      .map(r => (r.getAs[Long]("seed_rank"), r.getAs[Long]("vec_id"),
        r.getAs[Long]("maximin_dist"))).toList
    assert(got == List((1L, 0L, 0L), (2L, 1L, 144L), (3L, 2L, 9L),
      (4L, 3L, 1L)))
  }

  test("maximin seeds: duplicate corpus never re-picks a chosen seed") {
    import spark.implicits._
    // every vector identical -> all distances 0; seeds must still be
    // 4 DISTINCT ids (smallest unchosen wins each round)
    val df = (0L until 6L).map(i => (i, Array(1e-3f, 0.0f), 0))
      .toDF("vec_id", "embedding", "label")
    val got = KMeans.maximinSeeds(df).collect()
      .map(r => r.getAs[Long]("vec_id")).toList
    assert(got == List(0L, 1L, 2L, 3L))
  }

  test("merge proof: parity-half partials reassemble the full Lloyd step") {
    val vecs = Tables.embeddings(spark, sf("sf0.001"))
    val full = KMeans.kmeansStep(vecs, 6)
      .select("centroid_id", "dim", "n_members", "mean_fp")
    val merged = KMeans.kmeansMergeProof(vecs, 6)
      .select("centroid_id", "dim", "n_members", "mean_fp")
    assert(full.count() == merged.count())
    assert(merged.except(full).count() == 0L)
    assert(full.except(merged).count() == 0L)
  }

  test("k5 silhouette: cosine-vs-euclid disagreement surfaces as a negative score") {
    import spark.implicits._
    // centroids (k=2): c0 = v0 = (1,0), c1 = v1 = (10,10).
    // v2 = (3,3): cosine picks c1 (same direction) but v2 sits euclidean-
    // closer to c0 -> a > b -> s < 0, the norm-outlier flag.
    // v3 = (0.9,0): cosine picks c0 and is euclidean-closest to it -> s ~ 1.
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f), 0),
      (1L, Array(10.0f, 10.0f), 0),
      (2L, Array(3.0f, 3.0f), 0),
      (3L, Array(0.9f, 0.0f), 0))
      .toDF("vec_id", "embedding", "label")
    val rows = KMeans.simplifiedSilhouette(vecs, 2).collect()
      .map(r => r.getAs[Long]("cluster") -> r).toMap
    assert(rows.keySet == Set(0L, 1L))
    val c0 = rows(0L); val c1 = rows(1L)
    assert(c0.getAs[Long]("n_members") == 2L && c1.getAs[Long]("n_members") == 2L)
    assert(c0.getAs[Long]("n_negative") == 0L)
    assert(c0.getAs[Double]("mean_silhouette") > 0.9,
      s"tight cluster must score high: $c0")
    assert(c1.getAs[Long]("n_negative") == 1L,
      "v2's cosine assignment disagrees with euclidean proximity")
    assert(c1.getAs[Double]("min_silhouette") < 0.0)
    // seeds themselves always score s = 1 (a = 0): mean stays bounded
    rows.values.foreach(r =>
      assert(math.abs(r.getAs[Double]("mean_silhouette")) <= 1.0))
  }
}
