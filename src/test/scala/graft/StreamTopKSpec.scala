package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.StreamTopK
import graft.streaming.StreamTopK.{SSState, Tok}

class StreamTopKSpec extends SparkSpec {
  import spark.implicits._

  private def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")

  private def latestSnapshot(table: String): Map[String, (Long, Long)] = {
    val rows = spark.sql(
      s"""SELECT token, cnt, err FROM $table t
         |WHERE n_seen = (SELECT max(n_seen) FROM $table
         |                WHERE shard = t.shard)""".stripMargin)
      .as[(String, Long, Long)].collect()
    rows.map(r => r._1 -> (r._2, r._3)).toMap
  }

  test("under capacity the sketch is exact and equals the batch word count") {
    implicit val sq = spark.sqlContext
    val toks = Seq("a", "b", "a", "c", "a", "b").zipWithIndex
      .map { case (t, i) => Tok(ts(i + 1), t) }
    val in = MemoryStream[Tok]
    val q = StreamTopK.heavyHitters(in.toDS(), capacity = 8, nShards = 2)
      .writeStream.format("memory").queryName("hh_exact")
      .outputMode(OutputMode.Append()).start()
    in.addData(toks: _*); q.processAllAvailable()
    val got = latestSnapshot("hh_exact")
    assert(got == Map("a" -> (3L, 0L), "b" -> (2L, 0L), "c" -> (1L, 0L)))
    q.stop()
  }

  test("eviction keeps the error bound cnt-err <= true <= cnt, heavy key exact") {
    // one shard, capacity 2: a,a,a then b then c (c evicts b)
    val st = StreamTopK.foldTokens(SSState(0L, Map.empty),
      Seq("a", "a", "a", "b", "c").zipWithIndex
        .map { case (t, i) => Tok(ts(i + 1), t) }, capacity = 2)
    assert(st.n_seen == 5L)
    assert(st.counters("a") == ((3L, 0L)), "heavy key never evicted, exact")
    assert(st.counters("c") == ((2L, 1L)), "evictee inherits min count as err")
    assert(!st.counters.contains("b"))
    // bound: true(c)=1, cnt-err = 1 <= 1 <= 2 = cnt
  }

  test("stream snapshots equal the sequential batch replay across micro-batches") {
    implicit val sq = spark.sqlContext
    val batch1 = Seq("x", "y", "x", "z", "x").zipWithIndex
      .map { case (t, i) => Tok(ts(i + 1), t) }
    val batch2 = Seq("w", "y", "w", "w").zipWithIndex
      .map { case (t, i) => Tok(ts(i + 10), t) }
    val in = MemoryStream[Tok]
    val q = StreamTopK.heavyHitters(in.toDS(), capacity = 3, nShards = 1)
      .writeStream.format("memory").queryName("hh_replay")
      .outputMode(OutputMode.Append()).start()
    in.addData(batch1: _*); q.processAllAvailable()
    in.addData(batch2: _*); q.processAllAvailable()
    val got = latestSnapshot("hh_replay")
    val replay = StreamTopK.foldTokens(
      StreamTopK.foldTokens(SSState(0L, Map.empty), batch1, 3),
      batch2, 3)
    assert(got == replay.counters)
    assert(replay.n_seen == 9L)
    q.stop()
  }
}
