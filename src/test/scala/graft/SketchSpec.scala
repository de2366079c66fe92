package graft

import graft.operators.Sketch

class SketchSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (0L, "a a a b b c"),
    (1L, "a b c d e f g h i j"),
    (2L, "z z z z z z z z z z")
  ).toDF("doc_id", "text")

  test("CMS estimate is an upper bound on the exact count") {
    val rows = Sketch.cmsWordCounts(docs, 4, 64)
      .as[(String, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (w, n, est) =>
      assert(est >= n, s"CMS underestimated '$w': est=$est < n=$n")
    }
  }

  test("with width >> vocabulary the estimates are exact") {
    // 12 distinct words, width 4096: collision odds per row ~ 12/4096;
    // depth-4 min makes a collision in ALL rows vanishingly unlikely
    val rows = Sketch.cmsWordCounts(docs, 4, 4096)
      .as[(String, Long, Long)].collect()
    rows.foreach { case (w, n, est) => assert(est === n, s"'$w'") }
    val byWord = rows.map { case (w, n, est) => w -> ((n, est)) }.toMap
    assert(byWord("z")._1 === 10L)
  }

  test("total mass is conserved in every sketch row") {
    val buckets = Sketch.cmsSketch(docs, 4, 8).as[(Int, Long, Long)]
      .collect()
    val perRow = buckets.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    assert(perRow.keySet === Set(0, 1, 2, 3))
    perRow.foreach { case (row, mass) =>
      assert(mass === 26L, s"sketch row $row lost mass: $mass != 26")
    }
  }
}
