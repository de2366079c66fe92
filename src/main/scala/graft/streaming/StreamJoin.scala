package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream interval join: view→purchase attribution within a time
  * horizon (SURVEY.md §2.E [EXT] stretch) — the missing fourth join
  * shape next to the repo's stream-static (StreamDedup), streaming-agg
  * (StreamTrends) and stateful-map (StreamFunnel) modules.
  *
  * Semantics/state design:
  *  - Equality on the user key plus a RANGE condition on event time
  *    (buy_ts in [view_ts, view_ts + horizon]). The range condition is
  *    what lets Spark bound state: with both sides watermarked, a
  *    buffered view can be dropped once the watermark passes
  *    view_ts + horizon (no future purchase can match it), and a
  *    buffered purchase once the watermark passes buy_ts. Without the
  *    time bound the join would buffer both streams forever.
  *  - Inner join emits a match as soon as both sides arrive. Left-outer
  *    additionally emits (view, null purchase) — but only AFTER the
  *    watermark proves no match can still arrive, so un-attributed
  *    views surface exactly once.
  *  - At scale this shuffles both streams on the user key per
  *    micro-batch; state lives in the state store partitioned the same
  *    way, so a hot user salts exactly like a batch join would
  *    (operators.Skew) if ever needed.
  */
object StreamJoin {

  /** views(user_id, view_ts, page) ⋈ purchases(user_id, buy_ts, amount)
    * within `horizon`. `joinType`: "inner" or "left_outer". Output:
    * (user_id, view_ts, page, buy_ts, amount, lag_sec) — lag_sec (and
    * the purchase columns, on left_outer misses) null when unmatched. */
  def attributionJoin(views: DataFrame, purchases: DataFrame,
      horizon: String, watermark: String,
      joinType: String = "inner"): DataFrame = {
    val v = views
      .select(col("user_id").as("v_user"), col("view_ts"), col("page"))
      .withWatermark("view_ts", watermark)
    val p = purchases
      .select(col("user_id").as("p_user"), col("buy_ts"), col("amount"))
      .withWatermark("buy_ts", watermark)
    v.join(p,
        expr(s"v_user = p_user AND " +
          s"buy_ts >= view_ts AND buy_ts <= view_ts + interval $horizon"),
        joinType)
      .select(col("v_user").as("user_id"), col("view_ts"), col("page"),
        col("buy_ts"), col("amount"),
        (unix_timestamp(col("buy_ts")) - unix_timestamp(col("view_ts")))
          .as("lag_sec"))
  }

  /** The SAME join as a batch plan — the spec pins stream/batch
    * agreement through this shared shape (the StreamFunnel discipline:
    * one definition, two execution modes, answers cannot drift). */
  def attributionJoinBatch(views: DataFrame, purchases: DataFrame,
      horizon: String): DataFrame =
    views.select(col("user_id").as("v_user"), col("view_ts"), col("page"))
      .join(purchases.select(col("user_id").as("p_user"), col("buy_ts"),
          col("amount")),
        expr(s"v_user = p_user AND " +
          s"buy_ts >= view_ts AND buy_ts <= view_ts + interval $horizon"))
      .select(col("v_user").as("user_id"), col("view_ts"), col("page"),
        col("buy_ts"), col("amount"),
        (unix_timestamp(col("buy_ts")) - unix_timestamp(col("view_ts")))
          .as("lag_sec"))
}
