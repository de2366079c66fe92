package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Streaming deduplication (SURVEY.md §2.E [EXT] stretch) — the
  * ingestion-time shape of [[graft.operators.Dedup]]: keep the first
  * occurrence of each normalized text as documents ARRIVE, instead of
  * re-deduplicating the corpus in batch.
  *
  * Two production shapes:
  *  - Within-stream: `dropDuplicatesWithinWatermark` on the normalized
  *    text, so dedup state EXPIRES with the watermark — bounded memory,
  *    unlike a plain dropDuplicates whose state grows with the corpus.
  *    The trade-off is the contract every streaming deduper documents:
  *    duplicates separated by more than the watermark delay are kept.
  *  - Against-corpus: a stream-static LEFT OUTER join against the
  *    existing corpus's distinct norm index (the streaming analog of
  *    [[Dedup.exactDedupIncremental]]); the static side is re-read per
  *    micro-batch, so a nightly-compacted index serves a whole day of
  *    ingestion. Left outer + null filter is used rather than left anti
  *    because stream-static anti joins aren't in every engine's support
  *    matrix, while left outer is — and the plan is identical.
  *
  * Both operate per-key on the norm hash, so at scale the stream
  * partitions by norm exactly like the batch groupBy — no state skew
  * beyond the data's own duplicate skew.
  */
object StreamDedup {

  /** First-occurrence dedup within the stream; state bounded by the
    * watermark. Input needs (ts, doc_id, text). */
  def dedupStream(docs: DataFrame, watermark: String): DataFrame =
    docs
      .withColumn("norm", Dedup.normText(col("text")))
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("norm")
      .select("ts", "doc_id", "text")

  /** Streaming analog of the y6 chunk-level dedup: arriving docs explode
    * into context-window chunks and only never-seen chunks survive (state
    * keyed on the chunk's md5 digest, expiring with the watermark — the
    * same bounded-memory contract as [[dedupStream]]). The chunker is the
    * SAME [[graft.operators.Packing.chunkWindowsKeeping]] the batch path
    * uses, carrying `ts` through for the watermark, so batch and stream
    * can't drift on window semantics. Output: one row per surviving
    * chunk (ts, doc_id, chunk_id, h). */
  def chunkDedupStream(docs: DataFrame, size: Int, stride: Int,
                       watermark: String): DataFrame =
    graft.operators.Packing
      .chunkWindowsKeeping(docs.withWatermark("ts", watermark),
        size, stride, Seq("ts"))
      .select(col("ts"), col("doc_id"), col("chunk_id"),
        md5(col("chunk_text")).as("h"))
      .dropDuplicatesWithinWatermark("h")

  /** Drop arriving docs whose normalized text already exists in the
    * static corpus index (`corpus` needs a `text` column). */
  def dedupAgainstCorpus(docs: DataFrame, corpus: DataFrame): DataFrame = {
    val index = corpus.select(Dedup.normText(col("text")).as("norm"))
      .distinct()
      .withColumn("known", lit(1))
    docs.withColumn("norm", Dedup.normText(col("text")))
      .join(index, Seq("norm"), "left_outer")
      .where(col("known").isNull)
      .select("ts", "doc_id", "text")
  }
}
