package graft.plans

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed one-pass stage detector (SURVEY.md §2.F showcase).
  *
  * Computes A5-A8 — stage boundaries, durations, and map/shuffle overlap
  * (reference `analyze/common_utils.py:84-149`) — as a single
  * `Aggregator[ProgressEvent, StageBuf, StageTimes]` instead of eight
  * conditional aggregates. The buffer is a fixed-size record of epoch
  * extrema (plus the two latest timestamps for the 2nd-from-end
  * fallback), so partial aggregation and merge are O(1) per event and the
  * whole detection runs in one shuffle — the same plan shape as
  * `LogAnalytics.stageDetect`, with typed semantics unit-testable off the
  * cluster.
  */
object StageAggregator {

  /** One parsed progress event (A3 output). */
  final case class ProgressEvent(run: String, epochS: Long, mapPct: Int,
      redPct: Int)

  /** Mergeable extrema buffer; Long.MinValue/MaxValue are "unset". */
  final case class StageBuf(
      t0: Long, tEnd: Long, tMapDone: Long, tShufStart: Long, tShufEnd: Long,
      last1: Long, last2: Long)

  /** A7/A8 output row (2-dp seconds, overlap % clamped to [0,100]). */
  final case class StageTimes(totalS: Double, mapS: Double, shuffleS: Double,
      reduceS: Double, overlapPct: Double)

  private val Unset = Long.MaxValue
  private val UnsetMax = Long.MinValue

  val agg: Aggregator[ProgressEvent, StageBuf, StageTimes] =
    new Aggregator[ProgressEvent, StageBuf, StageTimes] {
      def zero: StageBuf =
        StageBuf(Unset, UnsetMax, Unset, Unset, Unset, UnsetMax, UnsetMax)

      def reduce(b: StageBuf, e: ProgressEvent): StageBuf = {
        val (l1, l2) =
          if (e.epochS >= b.last1) (e.epochS, b.last1) else (b.last1, math.max(b.last2, e.epochS))
        StageBuf(
          t0 = math.min(b.t0, e.epochS),
          tEnd = math.max(b.tEnd, e.epochS),
          // first map=100 (common_utils.py:86-89)
          tMapDone = if (e.mapPct == 100) math.min(b.tMapDone, e.epochS) else b.tMapDone,
          // first red>0 (:95-99)
          tShufStart = if (e.redPct > 0) math.min(b.tShufStart, e.epochS) else b.tShufStart,
          // first map=100 ∧ red≥90 — heuristic copied as-is (:106-110)
          tShufEnd = if (e.mapPct == 100 && e.redPct >= 90)
            math.min(b.tShufEnd, e.epochS) else b.tShufEnd,
          last1 = l1, last2 = l2)
      }

      def merge(a: StageBuf, b: StageBuf): StageBuf = {
        val tops = Seq(a.last1, a.last2, b.last1, b.last2)
          .sorted(Ordering[Long].reverse)
        StageBuf(
          math.min(a.t0, b.t0), math.max(a.tEnd, b.tEnd),
          math.min(a.tMapDone, b.tMapDone),
          math.min(a.tShufStart, b.tShufStart),
          math.min(a.tShufEnd, b.tShufEnd),
          tops(0), tops(1))
      }

      def finish(b: StageBuf): StageTimes = {
        if (b.t0 == Unset) return StageTimes(0, 0, 0, 0, 0)
        // 2nd-from-end fallback, or last when <2 events (:112-119)
        val fallback = if (b.last2 != UnsetMax) b.last2 else b.last1
        val shufEnd = if (b.tShufEnd != Unset) b.tShufEnd
          else if (b.tShufStart != Unset) fallback else Unset
        val total = (b.tEnd - b.t0).toDouble
        val mapS = if (b.tMapDone != Unset) (b.tMapDone - b.t0).toDouble else 0.0
        val shuffleS = if (b.tShufStart != Unset && shufEnd != Unset)
          (shufEnd - b.tShufStart).toDouble else 0.0
        val reduceS = if (b.tShufEnd != Unset) (b.tEnd - b.tShufEnd).toDouble else 0.0
        // overlap of [t0, tMapDone] with [tShufStart, shufEnd] (:137-149)
        val overlap =
          if (b.tMapDone == Unset || b.tShufStart == Unset || shufEnd == Unset ||
            shufEnd == b.tShufStart) 0.0
          else {
            val ov = math.max(0L, math.min(b.tMapDone, shufEnd) -
              math.max(b.t0, b.tShufStart)).toDouble
            math.floor(ov * 100.0 / (shufEnd - b.tShufStart) * 100.0 + 0.5) / 100.0
          }
        StageTimes(total, mapS, shuffleS, reduceS, overlap)
      }

      def bufferEncoder: Encoder[StageBuf] = Encoders.product[StageBuf]
      def outputEncoder: Encoder[StageTimes] = Encoders.product[StageTimes]
    }

  /** Per-run stage times in one typed pass. */
  def stageTimes(events: Dataset[ProgressEvent]): Dataset[(String, StageTimes)] = {
    implicit val tupleEnc: Encoder[(String, StageTimes)] =
      Encoders.tuple(Encoders.STRING, Encoders.product[StageTimes])
    implicit val strEnc: Encoder[String] = Encoders.STRING
    events.groupByKey(_.run).agg(agg.toColumn.name("stages"))
  }
}
