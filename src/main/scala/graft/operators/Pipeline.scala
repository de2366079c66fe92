package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Q, Tables}

/** End-to-end training-data pipeline composition — the proof that the
  * operator library COMPOSES: one declarative plan that deduplicates,
  * quality-filters, splits, and summarizes a corpus, exactly the chain a
  * data-curation job runs nightly:
  *
  *   normalize → exact-dedup survivors → minimum-quality filter
  *   (token count) → deterministic train/val/test split → per-(split,
  *   lang) census with token budgets.
  *
  * Everything stays in ONE lazy plan: Catalyst sees the whole chain, so
  * the tokenizer runs once per row, the dedup groupBy and the census
  * reuse the same scan, and filters sink as far down as semantics allow.
  * At 100 TB each stage is the already-audited operator shape (hash
  * groupBy dedup, map-only filters and split assignment, reduced final
  * aggregate) — composing them adds no new shuffle beyond the dedup and
  * the census.
  */
object Pipeline {

  import Dedup.md5Long56

  /** The curation chain over `docs`; survivors = min doc_id per
    * normalized text, quality bar = at least `minTokens` tokens. */
  def curate(docs: DataFrame, minTokens: Int): DataFrame = {
    val survivors = docs
      .select(col("doc_id"), col("lang"),
        Dedup.normText(col("text")).as("norm"),
        expr(s"cast(size(${Dedup.tokensExpr}) as bigint)").as("n_toks"))
      .groupBy("norm")
      // min, not first: copies could disagree on lang, and first() is
      // partition-order-dependent
      .agg(min(col("doc_id")).as("doc_id"),
        min(col("lang")).as("lang"), min(col("n_toks")).as("n_toks"),
        count(lit(1)).as("n_copies"))
      .where(col("n_toks") >= minTokens)
    survivors
      .withColumn("split",
        when(expr(s"${md5Long56("cast(doc_id as string)")} % 10") < 8, lit("train"))
          .when(expr(s"${md5Long56("cast(doc_id as string)")} % 10") === 8, lit("val"))
          .otherwise(lit("test")))
      .groupBy("split", "lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_toks")).as("tok_sum"),
        sum(col("n_copies") - 1L).as("dups_removed"))
  }
}

object PipelineQueries {
  import Pipeline._

  private val toksSql =
    "list_filter(string_split_regex(text, '[ \t\n\r\f]+'), x -> x <> '')"
  private val pctSql =
    "('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 14))::BIGINT % 10"

  val qs: Seq[Q] = Seq(
    Q("e1_pipeline",
      (s, d) => curate(Tables.documents(s, d), 20).orderBy("split", "lang"),
      Some(s"""WITH n AS (
              |  SELECT doc_id, lang,
              |         lower(trim(regexp_replace(text, '[ \t\n\r\f]+', ' ', 'g'))) AS norm,
              |         CAST(len($toksSql) AS BIGINT) AS n_toks
              |  FROM documents),
              |surv AS (
              |  SELECT min(doc_id) AS doc_id, min(lang) AS lang,
              |         min(n_toks) AS n_toks, count(*) AS n_copies
              |  FROM n GROUP BY norm),
              |q AS (SELECT * FROM surv WHERE n_toks >= 20),
              |sp AS (
              |  SELECT CASE WHEN $pctSql < 8 THEN 'train'
              |              WHEN $pctSql = 8 THEN 'val'
              |              ELSE 'test' END AS split,
              |         lang, n_toks, n_copies
              |  FROM q)
              |SELECT split, lang, count(*) AS n_docs,
              |       CAST(sum(n_toks) AS BIGINT) AS tok_sum,
              |       CAST(sum(n_copies - 1) AS BIGINT) AS dups_removed
              |FROM sp GROUP BY split, lang ORDER BY split, lang""".stripMargin),
      doc = "end-to-end curation pipeline in ONE plan: normalize -> dedup " +
        "survivors -> quality filter -> hash split -> per-split census"),
  )
}
