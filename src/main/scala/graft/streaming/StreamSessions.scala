package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming sessionization: gap-based dynamic windows via
  * `session_window` — the streaming counterpart of the batch
  * sessionizers (A2's delimiter sessions, f3's gap sessions). Where the
  * batch operator reconstructs sessions from a complete log with a
  * running-sum window, the streaming form maintains ONE open session
  * row per (user, session) in the state store and extends/merges it as
  * events arrive.
  *
  * Scale/semantics design:
  *  - `session_window(ts, gap)` windows grow per-key with each event
  *    and merge when a late event bridges two open sessions — exactly
  *    the gap-sessionization semantics, but incremental: state is one
  *    row per OPEN session, not per event. The heavy shuffle is keyed
  *    (user_id, session), so it scales out by user like every other
  *    keyed stream here.
  *  - The WATERMARK is what closes sessions: once it passes
  *    last-event + gap, the session can no longer extend, finalizes,
  *    emits once (append mode), and its state is dropped. Without it,
  *    every user ever seen would hold state forever.
  *  - Aggregates must be mergeable (counts/sums here) because two open
  *    sessions bridged by a late event combine their partial states —
  *    the same constraint MinHash/HLL sketches satisfy in the batch
  *    layer.
  */
object StreamSessions {

  /** Finalized per-user sessions. Input needs (ts, user_id, value). */
  def userSessions(events: DataFrame, gap: String,
                   watermark: String): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
      .select(col("session_window.start").as("sess_start"),
        col("session_window.end").as("sess_end"),
        col("user_id"), col("n_events"), col("sum_value"))
}
