package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Tables.documents(spark, sf("sf0.001"))

  test("media framing produces a real binary column") {
    val f = Multimodal.mediaFrame(docs)
    assert(f.schema("media").dataType ===
      org.apache.spark.sql.types.BinaryType)
    assert(f.count() === docs.count())
  }

  test("decodeBatches (mapPartitions codec stub) is deterministic and total") {
    val a = Multimodal.decodeBatches(Multimodal.mediaFrame(docs))
      .as[(Long, Int, Long)].collect().sortBy(_._1)
    val b = Multimodal.decodeBatches(Multimodal.mediaFrame(docs))
      .as[(Long, Int, Long)].collect().sortBy(_._1)
    assert(a.toSeq === b.toSeq)
    assert(a.length === docs.count())
    // n_bytes matches the declarative octet_length path
    val meta = Multimodal.decodeMeta(Multimodal.mediaFrame(docs))
      .select("doc_id", "n_bytes").as[(Long, Int)].collect().toMap
    assert(a.forall { case (id, n, _) => meta(id) === n })
  }

  test("props extraction is typed (LongType) and non-null on valid JSON") {
    val k = Multimodal.propsExtract(Tables.events(spark, sf("sf0.001")))
    assert(k.schema("k").dataType === org.apache.spark.sql.types.LongType)
    assert(k.where(col("k").isNull).count() === 0)
  }

  test("frame sampling yields stride-spaced offsets starting at 0") {
    val fs = Multimodal.frameSample(docs, 64, 2)
      .groupBy("doc_id").agg(collect_list("frame_no").as("frames"))
      .as[(Long, Seq[Int])].collect()
    fs.foreach { case (_, frames) =>
      val s = frames.sorted
      assert(s.head === 0)
      assert(s.zip(s.tail).forall { case (a, b) => b - a === 2 })
    }
  }
}
