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

  test("triangle census: a 4-clique closes every wedge; a path closes none") {
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
      .toDF("doc_a", "doc_b")
    val r = Graph.triangleCensus(k4).collect()(0)
    // K4: 4 nodes, 6 edges, C(3,2)*4 = 12 wedges, 4 triangles, cc = 1;
    // all degrees 3 << cap, so capped == uncapped and no hubs
    assert((r.getAs[Long]("n_nodes"), r.getAs[Long]("n_edges"),
      r.getAs[Long]("n_wedges"), r.getAs[Long]("n_triangles")) ==
      ((4L, 6L, 12L, 4L)))
    assert(r.getAs[Long]("n_hub_nodes") == 0L)
    assert(r.getAs[Long]("n_wedges_capped") == 12L)
    assert(r.getAs[Double]("global_cc") == 1.0)
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("doc_a", "doc_b")
    val pr = Graph.triangleCensus(path).collect()(0)
    assert(pr.getAs[Long]("n_wedges") == 2L && pr.getAs[Long]("n_triangles") == 0L)
    assert(pr.getAs[Double]("global_cc") == 0.0)
  }

  test("triangle census hub guard: an over-cap vertex is excluded from enumeration, visibly") {
    // hub 0 connects to cap+10 leaves, plus one organic triangle (1,2,3)
    // among the leaves: the hub (degree > cap) drops from the
    // enumeration subgraph — its wedges never reach the join — while
    // the full-graph monitors still count it and n_hub_nodes reports it
    val cap = Graph.DefaultTriangleDegCap
    val n = cap + 10
    val hub = (1 to n).map(i => (0L, i.toLong)) ++
      Seq((1L, 2L), (2L, 3L), (1L, 3L))
    val r = Graph.triangleCensus(hub.toDF("doc_a", "doc_b")).collect()(0)
    assert(r.getAs[Long]("n_nodes") == n.toLong + 1)
    assert(r.getAs[Long]("n_edges") == n.toLong + 3)
    assert(r.getAs[Long]("n_hub_nodes") == 1L)
    // capped subgraph: just the leaf triangle (leaves 1,2,3 have deg 2
    // once the hub edges vanish with the hub vertex)
    assert(r.getAs[Long]("n_wedges_capped") == 3L)
    assert(r.getAs[Long]("n_triangles") == 1L)
    assert(r.getAs[Double]("global_cc") == 1.0)
    // and with the cap raised above the hub degree the full count returns
    val full = Graph.triangleCensus(hub.toDF("doc_a", "doc_b"), degCap = n + 5)
      .collect()(0)
    assert(full.getAs[Long]("n_hub_nodes") == 0L)
    assert(full.getAs[Long]("n_triangles") == 1L + 3L) // leaf tri + 3 hub tris
  }

  test("g31 hub-guard adjudication: mega-clique splits into singleton reps, guarded pr keeps the tail") {
    // clique {1,2,3,4} (deg 3 each) over a degCap of 2 -> all four are
    // hubs; organic pair (10,11) survives the guard; doc 20 is never in
    // the graph. Same text everywhere -> quality ties -> min-id reps.
    val pairs = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (10L, 11L)).toDF("doc_a", "doc_b")
    val docs = Seq(1L, 2L, 3L, 4L, 10L, 11L, 20L)
      .map(id => (id, "the same words here", "en", 19L))
      .toDF("doc_id", "text", "lang", "n_chars")
    val r = Graph.hubGuardAdjudication(docs, pairs,
      operators.Dedup.dedupClusters(pairs), degCap = 2).collect()(0)
    assert(r.getAs[Long]("n_nodes") == 6L)
    assert(r.getAs[Long]("n_hub_nodes") == 4L)
    assert(r.getAs[Long]("n_edges_full") == 7L)
    assert(r.getAs[Long]("n_edges_guarded") == 1L)
    // guarded pagerank ranks only {10, 11}; both are in the full top-k
    assert(r.getAs[Long]("rank_overlap_k") == 2L)
    // full reps: clique rep 1, pair rep 10, singleton 20
    assert(r.getAs[Long]("n_reps_full") == 3L)
    // guarded clustering re-admits every clique member as its own rep —
    // the recall loss this census exists to price
    assert(r.getAs[Long]("n_reps_guarded") == 6L)
    assert(r.getAs[Long]("n_reps_common") == 3L)
  }

  test("triangle census: hub star orients away from leaves, no false triangles") {
    // star K1,4 : wedges 6 at the hub, 0 triangles — the degree
    // orientation points every edge leaf->hub (out-degree 1 and 0), so
    // the join enumerates ZERO candidate wedges at the quadratic hub
    val star = Seq((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L)).toDF("doc_a", "doc_b")
    val r = Graph.triangleCensus(star).collect()(0)
    assert((r.getAs[Long]("n_nodes"), r.getAs[Long]("n_edges"),
      r.getAs[Long]("n_wedges"), r.getAs[Long]("n_triangles")) ==
      ((5L, 4L, 6L, 0L)))
  }

  test("resource-allocation link prediction: shared low-degree neighbors score") {
    // path 1-2-3: only (1,3) is non-adjacent with a common neighbor;
    // RA = 1/deg(2) = 0.5
    val path = Seq((1L, 2L), (2L, 3L)).toDF("doc_a", "doc_b")
    val p = Graph.resourceAllocTop(path, 5).collect()
    assert(p.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq ==
      Seq((1L, 3L, 0.5)))
    // 4-cycle 1-2-3-4-1: both diagonals share two degree-2 neighbors -> 1.0
    val cyc = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L)).toDF("doc_a", "doc_b")
    val c = Graph.resourceAllocTop(cyc, 5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(c == Set((1L, 3L, 1.0), (2L, 4L, 1.0)))
  }

  test("ranks are bounded below by the damping floor on real data") {
    val pairs = operators.Dedup.minhashCandidates(
      Tables.documents(spark, sf("sf0.001")), 4)
    val r = Graph.pagerank(pairs, 3)
    assert(r.where(col("pagerank") < 0.15).count() == 0)
    assert(r.count() > 0)
  }
}
