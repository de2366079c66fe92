package graft

import java.nio.file.Files

import graft.operators.{Dedup, Materialize}

/** The materialization seam every lineage-truncating operator goes
  * through (viaSharedScan shapes g4/g7/y4/e1, the dedupClusters loop):
  * default local checkpoint, opt-in reliable checkpoint under
  * spark.graft.checkpointDir — the cluster-production setting where an
  * executor loss must not kill an iterative job. */
class MaterializeSpec extends SparkSpec {
  import spark.implicits._

  test("default mode: eager, lineage truncated to a stored-rows scan") {
    val df = Seq(1, 2, 3).toDF("x").where($"x" > 1)
    val m = Materialize.frame(df)
    assert(m.as[Int].collect().sorted === Array(2, 3))
    // the parent plan is gone — downstream audits see a stored scan
    assert(m.queryExecution.executedPlan.toString.contains("ExistingRDD"),
      m.queryExecution.executedPlan.toString.take(400))
  }

  test("spark.graft.checkpointDir: reliable checkpoint files are written " +
      "and the iterative operator still converges") {
    val dir = Files.createTempDirectory("graft-ckpt").toFile
    spark.conf.set(Materialize.ConfKey, dir.getAbsolutePath)
    try {
      val m = Materialize.frame(Seq(1, 2, 3).toDF("x"))
      assert(m.as[Int].collect().sorted === Array(1, 2, 3))
      def files(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(files) else Seq(f)
      assert(files(dir).nonEmpty, "reliable mode must write checkpoint files")
      // end-to-end: the pointer-jumping loop materializes per round via
      // the reliable path and must produce the same clustering
      val pairs = Seq((0L, 1L), (1L, 2L), (3L, 4L)).toDF("doc_a", "doc_b")
      val cl = Dedup.dedupClusters(pairs)
        .as[(Long, Long)].collect().toMap
      assert(cl === Map(0L -> 0L, 1L -> 0L, 2L -> 0L, 3L -> 3L, 4L -> 3L))
    } finally spark.conf.unset(Materialize.ConfKey)
  }
}
