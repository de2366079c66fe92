package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.operators.Snapshot
import graft.streaming.StreamUpsert

final case class Patch(doc_id: Long, source: String, n_chars: Long)

class StreamUpsertSpec extends SparkSpec {
  import spark.implicits._

  private def snapRows(dir: String) =
    StreamUpsert.currentSnapshot(spark, dir)
      .as[(Long, String, Long)].collect().toSet

  test("streaming upsert agrees with the batch upsert, batch by batch") {
    implicit val sq = spark.sqlContext
    val dir = Files.createTempDirectory("stream_upsert").toString
    val in = MemoryStream[Patch]
    val q = StreamUpsert.maintain(in.toDF(), dir)

    val b1 = Seq(Patch(1, "a", 10), Patch(2, "a", 20), Patch(3, "a", 30))
    in.addData(b1: _*)
    q.processAllAvailable()
    val exp1 = Snapshot.upsert(
        StreamUpsert.currentSnapshot(spark, dir).limit(0), b1.toDF())
      .select("doc_id", "source", "n_chars")
      .as[(Long, String, Long)].collect().toSet
    assert(snapRows(dir) === exp1)
    assert(snapRows(dir) === b1.map(p => (p.doc_id, p.source, p.n_chars)).toSet)

    // batch 2 patches doc 2 and adds doc 4 — the committed snapshot must
    // equal the batch-path fold of the same two patch sets
    val b2 = Seq(Patch(2, "b", 25), Patch(4, "b", 40))
    in.addData(b2: _*)
    q.processAllAvailable()
    q.stop()
    val batchFold = Snapshot.upsert(
        Snapshot.upsert(b1.toDF().limit(0), b1.toDF())
          .select("doc_id", "source", "n_chars"),
        b2.toDF())
      .select("doc_id", "source", "n_chars")
      .as[(Long, String, Long)].collect().toSet
    assert(snapRows(dir) === batchFold)
    assert(snapRows(dir) ===
      Set((1L, "a", 10L), (2L, "b", 25L), (3L, "a", 30L), (4L, "b", 40L)))
  }

  test("readers only ever see committed versions; history is retained") {
    implicit val sq = spark.sqlContext
    val dir = Files.createTempDirectory("stream_upsert_v").toString
    // nothing committed yet -> empty snapshot, correct schema
    assert(StreamUpsert.currentSnapshot(spark, dir).count() === 0L)
    val in = MemoryStream[Patch]
    val q = StreamUpsert.maintain(in.toDF(), dir)
    in.addData(Patch(1, "a", 10))
    q.processAllAvailable()
    in.addData(Patch(1, "b", 11))
    q.processAllAvailable()
    q.stop()
    // latest wins at the pointer; the previous version dir still exists
    assert(snapRows(dir) === Set((1L, "b", 11L)))
    val dirs = new java.io.File(dir).listFiles().filter(_.isDirectory)
      .map(_.getName).toSet
    assert(dirs.contains("v0") && dirs.contains("v1"))
  }
}
