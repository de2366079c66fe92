package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.StreamDedup

class StreamDedupSpec extends SparkSpec {
  import spark.implicits._

  final case class Doc(ts: Timestamp, doc_id: Long, text: String)
  private def ts(s: Int) = Timestamp.valueOf(f"2024-01-01 00:00:$s%02d")

  test("within-stream dedup keeps the first occurrence across micro-batches") {
    implicit val sq = spark.sqlContext
    val in = MemoryStream[Doc]
    val q = StreamDedup.dedupStream(in.toDF(), "1 hour")
      .writeStream.format("memory").queryName("sdedup")
      .outputMode(OutputMode.Append()).start()
    in.addData(
      Doc(ts(1), 1, "alpha beta"),
      Doc(ts(2), 2, "  alpha   beta "), // same normalized text
      Doc(ts(3), 3, "gamma"))
    q.processAllAvailable()
    in.addData(Doc(ts(10), 4, "ALPHA beta"), Doc(ts(11), 5, "delta"))
    q.processAllAvailable()
    val kept = spark.sql("SELECT doc_id FROM sdedup ORDER BY doc_id")
      .as[Long].collect().toList
    q.stop()
    assert(kept === List(1L, 3L, 5L),
      "later duplicates (same norm) must be dropped, firsts kept")
  }

  test("against-corpus dedup drops known texts, passes new ones") {
    implicit val sq = spark.sqlContext
    val corpus = Seq((100L, "alpha beta"), (101L, "gamma"))
      .toDF("doc_id", "text")
    val in = MemoryStream[Doc]
    val q = StreamDedup.dedupAgainstCorpus(in.toDF(), corpus)
      .writeStream.format("memory").queryName("scorpus")
      .outputMode(OutputMode.Append()).start()
    in.addData(
      Doc(ts(1), 1, " Alpha   BETA "), // known after normalization
      Doc(ts(2), 2, "delta"))
    q.processAllAvailable()
    val kept = spark.sql("SELECT doc_id FROM scorpus").as[Long].collect().toList
    q.stop()
    assert(kept === List(2L))
  }

  test("streaming chunk dedup: repeated windows are dropped across docs and batches") {
    implicit val sq = spark.sqlContext
    val in = MemoryStream[Doc]
    val q = StreamDedup.chunkDedupStream(in.toDF(), 3, 3, "1 hour")
      .writeStream.format("memory").queryName("schunk")
      .outputMode(OutputMode.Append()).start()
    in.addData(Doc(ts(1), 1, "a b c d e f")) // chunks: "a b c", "d e f"
    q.processAllAvailable()
    in.addData(
      Doc(ts(2), 2, "a b c x y z"), // "a b c" already seen -> only "x y z"
      Doc(ts(3), 3, "d e f"))       // fully duplicated -> nothing
    q.processAllAvailable()
    val kept = spark.sql("SELECT doc_id, chunk_id FROM schunk ORDER BY doc_id, chunk_id")
      .as[(Long, Long)].collect().toList
    q.stop()
    assert(kept === List((1L, 0L), (1L, 1L), (2L, 1L)),
      "only first occurrences of each 3-token window may survive")
  }

  test("streaming chunk dedup: state expires with the watermark (documented contract)") {
    // duplicates separated by MORE than the watermark delay are KEPT —
    // the bounded-memory trade-off every streaming deduper documents
    implicit val sq = spark.sqlContext
    val in = MemoryStream[Doc]
    val q = StreamDedup.chunkDedupStream(in.toDF(), 3, 3, "5 seconds")
      .writeStream.format("memory").queryName("schunkwm")
      .outputMode(OutputMode.Append()).start()
    in.addData(Doc(ts(1), 1, "a b c"))
    q.processAllAvailable()
    // advance event time far past the watermark, then replay the chunk
    in.addData(Doc(ts(50), 2, "q r s"))
    q.processAllAvailable()
    in.addData(Doc(ts(55), 3, "a b c"))
    q.processAllAvailable()
    val kept = spark.sql("SELECT doc_id FROM schunkwm ORDER BY doc_id")
      .as[Long].collect().toList
    q.stop()
    assert(kept.contains(1L) && kept.contains(3L),
      "a duplicate arriving after state expiry must be kept again")
  }
}
