package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming heavy hitters: a sharded SpaceSaving (Metwally et al.,
  * "Efficient computation of frequent and top-k elements in data
  * streams") summary over an unbounded token stream — the
  * bounded-state answer to the top-k question StreamTrends explicitly
  * defers to batch (exact streaming top-k needs complete-mode
  * re-emission; a SpaceSaving sketch needs `capacity` counters, ever).
  *
  * Scale/semantics design:
  *  - Tokens route to `nShards` state keys by a deterministic hash, so
  *    ALL occurrences of a token land on ONE shard: each shard is an
  *    independent SpaceSaving summary of its token partition, and the
  *    union of shard summaries inherits the per-shard guarantees
  *    (cnt − err ≤ true ≤ cnt; any token with shard-local frequency
  *    > n_shard/capacity is present). Sharding is the throughput knob —
  *    state is nShards × capacity counters FOREVER, no watermark needed.
  *  - Eviction is deterministic: the minimum-count counter, smallest
  *    token first — so the stream result is reproducible and equals the
  *    spec's sequential batch replay of the same fold.
  *  - Each micro-batch emits the shard's full current summary stamped
  *    with n_seen (rows folded so far); downstream reads the max-n_seen
  *    snapshot per shard and sorts for global top-k. Append mode, no
  *    retractions — snapshots are versioned, not mutated.
  */
object StreamTopK {

  final case class Tok(ts: Timestamp, token: String)

  /** One summary counter: cnt overestimates the true count by at most
    * err (the count it inherited from the counter it evicted). */
  final case class SSRow(shard: Int, n_seen: Long, token: String,
                         cnt: Long, err: Long)

  final case class SSState(n_seen: Long, counters: Map[String, (Long, Long)])

  def shardOf(token: String, nShards: Int): Int =
    math.floorMod(scala.util.hashing.MurmurHash3.stringHash(token), nShards)

  /** The shared fold both the stream and the spec's batch replay run:
    * SpaceSaving over an (ts, token)-ordered iterator. */
  def foldTokens(init: SSState, toks: Seq[Tok], capacity: Int): SSState =
    toks.sortBy(t => (t.ts.getTime, t.token)).foldLeft(init) { (st, t) =>
      val c1 = st.counters.get(t.token) match {
        case Some((c, e)) => st.counters.updated(t.token, (c + 1, e))
        case None if st.counters.size < capacity =>
          st.counters.updated(t.token, (1L, 0L))
        case None =>
          // evict the min-count counter (smallest token breaks ties)
          val (evTok, (evCnt, _)) = st.counters.minBy { case (k, (c, _)) => (c, k) }
          (st.counters - evTok).updated(t.token, (evCnt + 1, evCnt))
      }
      SSState(st.n_seen + 1, c1)
    }

  /** Per-batch versioned summary snapshots. Input needs (ts, token). */
  def heavyHitters(toks: Dataset[Tok], capacity: Int = 32,
                   nShards: Int = 8): Dataset[SSRow] = {
    import toks.sparkSession.implicits._
    toks.groupByKey(t => shardOf(t.token, nShards))
      .flatMapGroupsWithState[SSState, SSRow](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (shard, ts, state: GroupState[SSState]) =>
          val next = foldTokens(
            state.getOption.getOrElse(SSState(0L, Map.empty)),
            ts.toSeq, capacity)
          state.update(next)
          next.counters.iterator.map { case (tok, (c, e)) =>
            SSRow(shard, next.n_seen, tok, c, e)
          }
      }
  }
}
