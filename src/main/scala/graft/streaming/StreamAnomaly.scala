package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming z-score anomaly monitor: per event type, a single running
  * moment record (Welford's algorithm) scores every arriving value
  * against the distribution seen SO FAR and emits the outliers — the
  * alerting shape behind metric monitors (x38 dates a changepoint
  * offline; this flags the wild point the moment it arrives).
  *
  * Scale/semantics design:
  *  - State is ONE (n, mean, M2) record per event type — bounded by the
  *    type cardinality forever, no watermark needed for state size (a
  *    timeout would only matter for retiring dead types).
  *  - Each micro-batch's rows are folded in (ts, event_id) order, so
  *    the result is deterministic for a given micro-batch partitioning;
  *    for in-order feeds it equals the sequential fold of the whole
  *    stream — which is what the spec replays and asserts.
  *  - A value is scored against the state BEFORE it updates the moments
  *    (self-inclusion would dilute exactly the outliers being hunted),
  *    and only once `minN` prior observations exist — the standard
  *    cold-start guard.
  *  - Welford (not Σx/Σx²) keeps the running variance numerically
  *    stable over unbounded streams; this is a monitoring surface, so
  *    f64 moments are the contract (the oracle-gated exact-decimal
  *    statistics stay on the batch side).
  */
object StreamAnomaly {

  final case class ValueEvent(ts: Timestamp, event_id: Long,
                              event_type: String, value: Double)

  final case class Anomaly(event_id: Long, event_type: String,
                           value: Double, z: Double)

  /** Welford running moments; m2 = Σ(x − mean)². */
  final case class MomentState(n: Long, mean: Double, m2: Double) {
    def push(v: Double): MomentState = {
      val n1 = n + 1
      val d = v - mean
      val mean1 = mean + d / n1
      MomentState(n1, mean1, m2 + d * (v - mean1))
    }
    def zOf(v: Double): Option[Double] = {
      val variance = if (n >= 2) m2 / (n - 1) else 0.0
      if (n >= 2 && variance > 0.0) Some((v - mean) / math.sqrt(variance))
      else None
    }
  }

  /** The shared fold both the stream and the spec's batch replay run:
    * score-then-update over an ordered iterator. */
  def foldAnomalies(init: MomentState, evs: Seq[ValueEvent], k: Double,
                    minN: Long): (MomentState, Seq[Anomaly]) =
    evs.sortBy(e => (e.ts.getTime, e.event_id))
      .foldLeft((init, Vector.empty[Anomaly])) { case ((st, out), e) =>
        val flagged = st.n >= minN &&
          st.zOf(e.value).exists(z => math.abs(z) > k)
        val out1 =
          if (flagged)
            out :+ Anomaly(e.event_id, e.event_type, e.value,
              st.zOf(e.value).get)
          else out
        (st.push(e.value), out1)
      }

  /** Anomalous events (|z| > k vs the type's prior distribution). */
  def anomalies(events: Dataset[ValueEvent], k: Double = 3.0,
                minN: Long = 10): Dataset[Anomaly] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.event_type)
      .flatMapGroupsWithState[MomentState, Anomaly](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (_, evs, state: GroupState[MomentState]) =>
          val (next, out) = foldAnomalies(
            state.getOption.getOrElse(MomentState(0L, 0.0, 0.0)),
            evs.toSeq, k, minN)
          state.update(next)
          out.iterator
      }
  }
}
