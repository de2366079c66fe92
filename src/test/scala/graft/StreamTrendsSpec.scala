package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.StreamTrends

class StreamTrendsSpec extends SparkSpec {
  import spark.implicits._

  final case class Doc(ts: Timestamp, text: String)
  private def ts(m: Int, s: Int) = Timestamp.valueOf(f"2024-01-01 00:$m%02d:$s%02d")

  test("windowed token counts finalize once the watermark passes the window") {
    implicit val sq = spark.sqlContext
    val in = MemoryStream[Doc]
    val q = StreamTrends.trendingTerms(in.toDF(), "1 minute", "10 seconds")
      .writeStream.format("memory").queryName("trends")
      .outputMode(OutputMode.Append()).start()
    in.addData(
      Doc(ts(0, 5), "spark spark flink"),
      Doc(ts(0, 40), "spark beam"))
    q.processAllAvailable()
    // nothing finalized yet: watermark hasn't passed minute 0's end
    assert(spark.sql("SELECT count(*) FROM trends").as[Long].head() === 0L)
    // an event deep into minute 2 advances the watermark past minute 0
    in.addData(Doc(ts(2, 30), "late tokens"))
    q.processAllAvailable()
    val got = spark.sql("SELECT w, n FROM trends WHERE win_start = '2024-01-01 00:00:00'")
      .as[(String, Long)].collect().toMap
    q.stop()
    assert(got === Map("spark" -> 3L, "flink" -> 1L, "beam" -> 1L),
      "minute-0 counts must finalize exactly once with exact totals")
  }

  test("finalized windows equal the batch groupBy replay of the same expression") {
    // replay discipline for the streaming-agg shape: the finalized
    // append-mode rows must equal the SAME select/explode/groupBy
    // expression tree run in batch over the same events — watermarking
    // and incremental state must change nothing but delivery time
    implicit val sq = spark.sqlContext
    val evs = Seq(
      Doc(ts(0, 5), "spark spark flink"), Doc(ts(0, 40), "spark beam"),
      Doc(ts(1, 10), "beam beam"), Doc(ts(1, 50), "spark flink spark"))
    val in = MemoryStream[Doc]
    val q = StreamTrends.trendingTerms(in.toDF(), "1 minute", "10 seconds")
      .writeStream.format("memory").queryName("trends_replay")
      .outputMode(OutputMode.Append()).start()
    in.addData(evs: _*)
    q.processAllAvailable()
    in.addData(Doc(ts(5, 0), "flush")) // watermark past every evs window
    q.processAllAvailable()
    val streamed = spark.sql(
      "SELECT win_start, w, n FROM trends_replay WHERE w <> 'flush'")
      .as[(Timestamp, String, Long)].collect().toSet
    q.stop()
    import org.apache.spark.sql.functions.{col, count, explode, expr, lit, window}
    val batch = evs.map(d => (d.ts, d.text)).toDF("ts", "text")
      .select(col("ts"), explode(expr(operators.Dedup.tokensExpr)).as("w"))
      .groupBy(window(col("ts"), "1 minute"), col("w"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("win_start"), col("w"), col("n"))
      .as[(Timestamp, String, Long)].collect().toSet
    assert(streamed === batch, s"stream $streamed != batch replay $batch")
    assert(batch.exists { case (_, w, n) => w == "spark" && n == 3L })
  }

  test("a document straddling nothing lands in exactly its own window") {
    implicit val sq = spark.sqlContext
    val in = MemoryStream[Doc]
    val q = StreamTrends.trendingTerms(in.toDF(), "1 minute", "5 seconds")
      .writeStream.format("memory").queryName("trends2")
      .outputMode(OutputMode.Append()).start()
    in.addData(Doc(ts(0, 10), "alpha"), Doc(ts(1, 10), "alpha"))
    in.addData(Doc(ts(3, 0), "flush"))
    q.processAllAvailable()
    val wins = spark.sql("SELECT win_start, n FROM trends2 WHERE w = 'alpha'")
      .as[(Timestamp, Long)].collect().toMap
    q.stop()
    assert(wins.size === 2 && wins.values.forall(_ == 1L),
      "tumbling windows must not double-count across boundaries")
  }
}
