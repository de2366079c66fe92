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
}
