package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Q, Tables}

/** Deterministic sampling operators for training-data pipelines
  * (SURVEY.md §2.G [EXT] extension): Bernoulli-by-hash sampling,
  * fixed-size stratified sampling, and train/val/test splitting.
  *
  * Everything keys off a content-independent md5 of the row id — never
  * `rand()` — so samples are reproducible run-to-run, stable under
  * repartitioning, and identical across engines (the property a training
  * pipeline needs: re-running the job must not change the train set).
  *
  * Design for 100 TB:
  *  - Bernoulli sampling and split assignment are map-only projections —
  *    no shuffle, filters evaluate next to the scan.
  *  - Stratified top-n is one shuffle on the stratum key; the hash-order
  *    rank is a window, with the standard skew note: a stratum far larger
  *    than an executor's sort budget wants a two-phase per-partition
  *    pre-truncation (keep each partition's n smallest, then re-rank),
  *    which preserves exactly the same result set.
  */
object Sampling {

  import Dedup.md5Long56

  /** Portable uniform hash of doc_id in [0, 100). */
  private val pctExpr = s"${md5Long56("cast(doc_id as string)")} % 100"

  /** Bernoulli-by-hash sample: keep rows whose id-hash falls under
    * `pct`. Map-only; rate is exact in expectation and deterministic. */
  def hashSample(docs: DataFrame, pct: Int): DataFrame =
    docs.where(expr(pctExpr) < pct)
      .select("doc_id", "lang", "source", "n_chars")

  /** Fixed-size stratified sample: the `n` hash-smallest docs per
    * stratum — a deterministic uniform draw within each stratum.
    *
    * Two-phase top-n so huge strata never serialize into one sort task:
    * phase 1 ranks within (stratum, salt) — `salts` parallel windows per
    * stratum, each pruning to its own n smallest — and phase 2 ranks the
    * <= salts·n survivors per stratum. The global n hash-smallest rows
    * are contained in the union of per-salt n-smallest, so the result is
    * IDENTICAL to the single-window form; only the physical sort width
    * changes (each phase-1 partition sorts |stratum|/salts rows). */
  def stratifiedSample(docs: DataFrame, stratum: String, n: Int,
                       salts: Int = 64): DataFrame = {
    val h = expr(md5Long56("cast(doc_id as string)"))
    val pre = Window.partitionBy(col(stratum), (col("doc_id") % salts).as("salt"))
      .orderBy(col("h"), col("doc_id"))
    val fin = Window.partitionBy(stratum).orderBy(col("h"), col("doc_id"))
    docs.select(col(stratum), col("doc_id"), h.as("h"))
      .withColumn("pr", row_number().over(pre))
      .where(col("pr") <= n)
      .withColumn("rn", row_number().over(fin))
      .where(col("rn") <= n)
      .select(col(stratum), col("rn").as("rank"), col("doc_id"))
  }

  /** Train/val/test split by hash decile (8/1/1), with per-(split, lang)
    * counts — the reproducible split a fine-tuning pipeline snapshots. */
  def splitCounts(docs: DataFrame): DataFrame =
    docs.select(col("lang"), col("doc_id"),
      when(expr(pctExpr) % 10 < 8, lit("train"))
        .when(expr(pctExpr) % 10 === 8, lit("val"))
        .otherwise(lit("test")).as("split"))
      .groupBy("split", "lang")
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("first_doc"))
}

object SamplingQueries {
  import Sampling._
  private def docs(s: SparkSession, d: String) = Tables.documents(s, d)

  /** DuckDB mirror of the doc_id percent hash. */
  private val pctSql =
    "('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 14))::BIGINT % 100"

  val qs: Seq[Q] = Seq(
    Q("x1_hash_sample",
      (s, d) => hashSample(docs(s, d), 10).orderBy("doc_id"),
      Some(s"""SELECT doc_id, lang, source, n_chars FROM documents
              |WHERE $pctSql < 10 ORDER BY doc_id""".stripMargin),
      doc = "deterministic Bernoulli-by-hash sample (map-only, reproducible)"),

    Q("x2_stratified_sample",
      (s, d) => stratifiedSample(docs(s, d), "lang", 20).orderBy("lang", "rank"),
      Some(s"""WITH h AS (
              |  SELECT lang, doc_id,
              |         row_number() OVER (PARTITION BY lang
              |           ORDER BY ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 14))::BIGINT, doc_id) AS rn
              |  FROM documents)
              |SELECT lang, rn AS rank, doc_id FROM h
              |WHERE rn <= 20 ORDER BY lang, rank""".stripMargin),
      doc = "fixed-size stratified sample: n hash-smallest docs per stratum"),

    Q("x3_split_counts",
      (s, d) => splitCounts(docs(s, d)).orderBy("split", "lang"),
      Some(s"""SELECT CASE WHEN $pctSql % 10 < 8 THEN 'train'
              |            WHEN $pctSql % 10 = 8 THEN 'val'
              |            ELSE 'test' END AS split,
              |       lang, count(*) AS n_docs, min(doc_id) AS first_doc
              |FROM documents GROUP BY 1, 2 ORDER BY split, lang""".stripMargin),
      doc = "reproducible train/val/test split by hash decile + per-split census"),
  )
}
