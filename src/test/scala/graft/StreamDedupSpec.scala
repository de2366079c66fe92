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

  test("stream dedup equals the sequential batch replay (first occurrence per norm)") {
    // one event per micro-batch with arrival order == event-time order
    // == doc_id order, so the batch min-doc_id-per-norm answer IS the
    // sequential replay's survivor set — the StreamAnomaly replay
    // discipline applied to dedup: micro-batch boundaries and state
    // store round-trips must not change which copy survives
    implicit val sq = spark.sqlContext
    val evs = Seq(
      Doc(ts(1), 1, "alpha beta"), Doc(ts(2), 2, "gamma"),
      Doc(ts(3), 3, " ALPHA   beta "), Doc(ts(4), 4, "delta"),
      Doc(ts(5), 5, "gamma"), Doc(ts(6), 6, "alpha beta"))
    val in = MemoryStream[Doc]
    val q = StreamDedup.dedupStream(in.toDF(), "1 hour")
      .writeStream.format("memory").queryName("sdedup_replay")
      .outputMode(OutputMode.Append()).start()
    evs.foreach { e => in.addData(e); q.processAllAvailable() }
    val streamed = spark.sql("SELECT doc_id FROM sdedup_replay")
      .as[Long].collect().toSet
    q.stop()
    val batch = operators.Dedup.exactDedup(
        evs.map(d => (d.doc_id, d.text)).toDF("doc_id", "text"))
      .select("doc_id").as[Long].collect().toSet
    assert(streamed === batch,
      s"stream survivors $streamed != batch replay $batch")
    assert(batch === Set(1L, 2L, 4L))
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
