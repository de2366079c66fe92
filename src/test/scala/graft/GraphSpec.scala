package graft

import org.apache.spark.sql.functions._

import operators.Graph

class GraphSpec extends SparkSpec {
  import spark.implicits._

  test("regular symmetric graphs are a fixpoint: every rank stays 1.0") {
    // triangle: all degrees equal -> contributions sum to exactly 1
    val tri = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("doc_a", "doc_b")
    val r = Graph.pagerank(tri, 3).collect().map(_.getDouble(1))
    assert(r.toSeq == Seq(1.0, 1.0, 1.0))
  }

  test("star graph concentrates rank in the hub (exact 1-round values iterate)") {
    val star = Seq((0L, 1L), (0L, 2L), (0L, 3L)).toDF("doc_a", "doc_b")
    val got = Graph.pagerank(star, 1).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // hub: 0.15 + 0.85 * (1/1 * 3); leaf: 0.15 + 0.85 * (1/3)
    assert(got(0L) == 2.7)
    // contributions quantize at 12 dp and the output at 6 dp
    assert(math.abs(got(1L) - (0.15 + 0.85 / 3)) < 1e-6)
  }

  test("ranks are bounded below by the damping floor on real data") {
    val pairs = operators.Dedup.minhashCandidates(
      Tables.documents(spark, sf("sf0.001")), 4)
    val r = Graph.pagerank(pairs, 3)
    assert(r.where(col("pagerank") < 0.15).count() == 0)
    assert(r.count() > 0)
  }
}
