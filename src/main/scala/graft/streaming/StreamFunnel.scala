package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Live conversion funnel (streaming analog of
  * [[graft.operators.Funnel.funnelConversion]]): one tiny state record
  * per user advances through first-view → first-click-after-view →
  * first-purchase-after-click as events ARRIVE, so a dashboard reads
  * per-user stages without re-scanning history.
  *
  * Semantics match the batch operator for in-event-time-order feeds
  * (the batch windowed-min picks the earliest qualifying timestamp; the
  * state machine fixes each stage at the first qualifying event it
  * sees — identical when arrival order is event-time order, which the
  * spec asserts against the batch answer). State is three optional
  * timestamps per user — bounded, no growth with stream length.
  */
object StreamFunnel {

  final case class FunnelEvent(ts: Timestamp, user_id: Long, event_type: String)

  /** (tv, tc, tp) as epoch millis; None = stage not reached. */
  final case class FunnelState(tv: Option[Long], tc: Option[Long], tp: Option[Long]) {
    def stage: Int = Seq(tv, tc, tp).takeWhile(_.isDefined).size
    def advance(e: FunnelEvent): FunnelState = {
      val t = e.ts.getTime
      e.event_type match {
        case "view" if tv.isEmpty => copy(tv = Some(t))
        case "click" if tc.isEmpty && tv.exists(t > _) => copy(tc = Some(t))
        case "purchase" if tp.isEmpty && tc.exists(t > _) => copy(tp = Some(t))
        case _ => this
      }
    }
  }

  /** Per-user live stage: 0 = nothing, 1 = viewed, 2 = clicked after
    * view, 3 = purchased after click. Emits the refreshed stage for
    * every user touched by the micro-batch. */
  def liveStages(events: Dataset[FunnelEvent]): Dataset[(Long, Int)] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .mapGroupsWithState[FunnelState, (Long, Int)](GroupStateTimeout.NoTimeout()) {
        case (user, evs, state: GroupState[FunnelState]) =>
          val next = evs.toSeq.sortBy(_.ts.getTime)
            .foldLeft(state.getOption.getOrElse(FunnelState(None, None, None)))(
              _.advance(_))
          state.update(next)
          (user, next.stage)
      }
  }
}
