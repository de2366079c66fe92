package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Q, Tables}

/** The reference's one distributed query: WordCount (SURVEY.md §2.A,
  * W1-W9; reference invocation `wheel/run_mr_real.sh:53-57`).
  *
  * Spark-first mapping: declarative scan → explode/split → groupBy/count.
  * Catalyst plans this as partial HashAggregate → Exchange
  * hashpartitioning(word) → final HashAggregate, which IS the MR
  * map/combine/shuffle/reduce pipeline (the combiner — reference counters
  * `job_output.log:102-103` — is the automatic partial aggregate; nothing
  * to hand-write). Counts are Long, not Int: MR's IntWritable overflows
  * past 2^31 tokens, which a 100 TB corpus exceeds (SURVEY §7 risk 6).
  *
  * Tokenizer parity (SURVEY §7 risk 3): Java StringTokenizer emits no
  * empty tokens; `split` on `\\s+` can emit a leading "" for lines with
  * leading whitespace, so filter `length(word) > 0`.
  */
object WordCount {

  /** Whitespace class shared with the DuckDB oracle: Java `\s` includes
    * \x0B while RE2's does not, so both sides use this explicit class
    * (= StringTokenizer's default delims " \t\n\r\f"). */
  val WhitespaceRe = "[ \t\n\r\f]+"

  /** W1-W7: tokenize + count. Input: any DataFrame with a `text` column. */
  def wordCount(docs: DataFrame): DataFrame =
    docs
      .select(explode(split(col("text"), WhitespaceRe)).as("word"))
      .where(length(col("word")) > 0)
      .groupBy("word")
      .agg(count(lit(1)).as("cnt"))

  /** Top-k words (k small → `orderBy.limit` = TakeOrderedAndProject, no
    * global sort materialization). Ties broken by word for determinism. */
  def topWords(docs: DataFrame, k: Int): DataFrame =
    wordCount(docs).orderBy(col("cnt").desc, col("word")).limit(k)

  /** Token-conservation invariant surface (W2/W7: `Map output records` ==
    * sum of counts; reference counters `job_output.log:98,104-107`). */
  def tokenTotals(docs: DataFrame): DataFrame =
    wordCount(docs).agg(
      sum(col("cnt")).as("total_tokens"),
      count(lit(1)).as("distinct_words"))

  /** W8 sink: raw `word\tcount` lines (MR TextOutputFormat parity — the
    * CSV writer would quote fields containing tabs/quotes), one file per
    * partition, overwrite (W9). No global sort: MR only sorts within each
    * reducer, and a total order is pure overhead at 100 TB. */
  def writeTsv(df: DataFrame, path: String): Unit =
    df.sortWithinPartitions("word")
      .select(concat_ws("\t", col("word"), col("cnt")).as("value"))
      .write.mode("overwrite").text(path)
}

object WordCountQueries {
  private def docs(s: SparkSession, d: String) = Tables.documents(s, d)

  val qs: Seq[Q] = Seq(
    Q(
      "w1_wordcount",
      (s, d) => WordCount.wordCount(docs(s, d)).orderBy("word"),
      Some("""SELECT word, count(*) AS cnt
             |FROM (SELECT unnest(string_split_regex(text, '[ \t\n\r\f]+')) AS word
             |      FROM documents)
             |WHERE length(word) > 0
             |GROUP BY word ORDER BY word""".stripMargin),
      doc = "W1-W8 scan→tokenize→combine→shuffle→sum"),
    Q(
      "w2_top_words",
      (s, d) => WordCount.topWords(docs(s, d), 100),
      Some("""SELECT word, count(*) AS cnt
             |FROM (SELECT unnest(string_split_regex(text, '[ \t\n\r\f]+')) AS word
             |      FROM documents)
             |WHERE length(word) > 0
             |GROUP BY word ORDER BY cnt DESC, word LIMIT 100""".stripMargin),
      doc = "top-k with deterministic tie-break"),
    Q(
      "w3_token_totals",
      (s, d) => WordCount.tokenTotals(docs(s, d)),
      Some("""SELECT CAST(sum(cnt) AS BIGINT) AS total_tokens, count(*) AS distinct_words
             |FROM (SELECT word, count(*) AS cnt
             |      FROM (SELECT unnest(string_split_regex(text, '[ \t\n\r\f]+')) AS word
             |            FROM documents)
             |      WHERE length(word) > 0 GROUP BY word)""".stripMargin),
      doc = "token-conservation invariant (W2 vs W7 counters)"),
  )
}
