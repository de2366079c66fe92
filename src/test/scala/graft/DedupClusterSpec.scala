package graft

import graft.operators.Dedup

class DedupClusterSpec extends SparkSpec {
  import spark.implicits._

  test("components of a path + a disjoint edge get their min id as label") {
    // 1-2-3 chained (diameter 2) plus isolated pair 10-11
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("doc_a", "doc_b")
    val got = Dedup.dedupClusters(pairs).as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("long chain converges within maxIter via propagation") {
    val pairs = (1L until 12L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val got = Dedup.dedupClusters(pairs, maxIter = 20).as[(Long, Long)]
      .collect().toMap
    assert(got.values.toSet === Set(1L))
    assert(got.keySet === (1L to 12L).toSet)
  }

  test("empty pair table yields empty clustering") {
    val pairs = Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")
    assert(Dedup.dedupClusters(pairs).isEmpty)
  }
}
