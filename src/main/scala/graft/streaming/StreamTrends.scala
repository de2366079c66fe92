package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Streaming trending-terms: tumbling-window token counts over a
  * document stream — the canonical "what is spiking right now"
  * analytics shape (SURVEY.md §2.E [EXT] stretch).
  *
  * Scale/semantics design:
  *  - The per-window count is a streaming aggregation keyed on
  *    (window, token): partial aggregation combines map-side exactly
  *    like the batch WordCount (W4), state is one row per live
  *    (window, token), and the WATERMARK bounds "live" — closed
  *    windows finalize, emit once (append mode), and their state is
  *    dropped. Without the watermark the state would grow with the
  *    vocabulary of all time.
  *  - Append mode emits a window only after the watermark passes its
  *    end: results are FINAL counts, never retractions — the contract
  *    downstream sinks (files, Kafka topics) need.
  *  - No per-window top-k here: exact streaming top-k needs complete
  *    output mode (unbounded re-emission). The emitted finalized rows
  *    feed the batch top-k (w2) over any horizon — the lambda-free
  *    split real pipelines use.
  */
object StreamTrends {

  /** Finalized (window, token, n) rows. Input needs (ts, text). */
  def trendingTerms(docs: DataFrame, windowLen: String,
                    watermark: String): DataFrame =
    docs
      .withWatermark("ts", watermark)
      .select(col("ts"), explode(expr(Dedup.tokensExpr)).as("w"))
      .groupBy(window(col("ts"), windowLen), col("w"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("win_start"), col("w"), col("n"))
}
