package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Q, Tables}
import graft.functions.Parity.pround

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

  /** x11: deterministic WEIGHTED sample without replacement, the
    * Efraimidis–Spirakis one-pass scheme: each row gets the key
    * -ln(u)/w from a reproducible md5-uniform u and its weight w, and
    * the k smallest keys ARE a weighted sample without replacement
    * (w_i / Σw inclusion dynamics). Top-k compiles to
    * TakeOrderedAndProject — a map-side heap per partition, never a
    * global sort — so the pass is one scan at any scale. Rows with
    * non-positive weight are excluded (their key would be ±inf). */
  def weightedSample(docs: DataFrame, weightCol: String, k: Int): DataFrame = {
    val h = md5Long56("cast(doc_id as string)")
    // u in (0,1): the 56-bit hash midpoint-normalized so ln(u) is finite
    val key = s"-ln((cast($h as double) + 0.5) / 72057594037927936.0)" +
      s" / cast($weightCol as double)"
    docs.where(col(weightCol) > 0)
      .select(col("doc_id"), col(weightCol).as("w"), expr(key).as("es_key"))
      .orderBy(col("es_key"), col("doc_id")).limit(k)
      .select(col("doc_id"), col("w"), pround(col("es_key"), 9).as("es_key"))
  }

  /** x13: Population Stability Index between the train and test splits
    * of the x3 hash split, over fixed-width document-length bins — the
    * standard drift alarm between what a model trains on and what it's
    * evaluated on. Laplace smoothing (+0.5 per bin over `bins` cells)
    * keeps every term finite, and the result is PER-BIN contributions,
    * not a float total: each contribution is a pure projection of two
    * integer counts, so it is engine-exact, where summing the doubles
    * would depend on aggregation order (consumers sum the 10 rows —
    * PSI > 0.2 is the conventional alarm). One groupBy on the bin plus
    * a 1-row totals broadcast. */
  def psiDrift(docs: DataFrame, bins: Int = 10, binWidth: Int = 100): DataFrame = {
    val split = expr(s"$pctExpr % 10")
    val counts = docs.select(
        least(floor(col("n_chars") / binWidth), lit(bins - 1))
          .cast("long").as("bin"),
        when(split < 8, 1L).otherwise(0L).as("tr"),
        when(split === 9, 1L).otherwise(0L).as("te"))
      .groupBy("bin")
      .agg(sum(col("tr")).as("n_train"), sum(col("te")).as("n_test"))
    val tot = counts.agg(sum(col("n_train")).as("tt"), sum(col("n_test")).as("et"))
    val p = (col("n_train").cast("double") + 0.5) /
      (col("tt").cast("double") + 0.5 * bins)
    val q = (col("n_test").cast("double") + 0.5) /
      (col("et").cast("double") + 0.5 * bins)
    counts.crossJoin(broadcast(tot))
      .select(col("bin"), col("n_train"), col("n_test"),
        pround((p - q) * log(p / q), 9).as("psi_contrib"))
  }

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

  /** Deterministic dataset-mixture resampling — the "N epochs of source
    * A, half an epoch of source B" step that assembles a training mix
    * from heterogeneous corpora. Each group's epoch factor is an exact
    * rational num/denom: every doc emits `num div denom` full copies,
    * plus one more iff its namespaced id-hash mod denom falls under
    * `num % denom` — so a 2.5× group upsamples every doc twice and
    * exactly half the docs (by hash) a third time, reproducibly. Zero
    * weights drop the group entirely.
    *
    * Scale shape: broadcast the (tiny) weight table, map-side join +
    * explode — no shuffle at all; output rows carry an `epoch` index so
    * downstream global shuffling/packing can treat copies as distinct. */
  def mixture(docs: DataFrame, keyCol: String,
              epochs: Seq[(String, Int, Int)]): DataFrame = {
    require(epochs.forall { case (_, n, d) => n >= 0 && d > 0 },
      "epoch factors must be non-negative rationals")
    val sp = docs.sparkSession
    import sp.implicits._
    val w = epochs.toDF(keyCol, "num", "denom")
    val bucket = expr(s"${md5Long56("concat('mix:', cast(doc_id as string))")} % denom")
    docs.join(broadcast(w), keyCol)
      .withColumn("n_copies",
        expr("num div denom") + (bucket < expr("num % denom")).cast("long"))
      .where(col("n_copies") > 0)
      .select(col("doc_id"), col(keyCol),
        explode(expr("sequence(1L, n_copies)")).as("epoch"))
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

    Q("x11_weighted_sample",
      (s, d) => weightedSample(docs(s, d), "n_chars", 50).orderBy("es_key", "doc_id"),
      Some(s"""WITH keyed AS (
              |  SELECT doc_id, n_chars AS w,
              |         -ln((CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 14))::BIGINT
              |                   AS DOUBLE) + 0.5) / 72057594037927936.0)
              |           / CAST(n_chars AS DOUBLE) AS es_key
              |  FROM documents WHERE n_chars > 0)
              |SELECT doc_id, w,
              |       floor(es_key * 1000000000.0 + 0.5) / 1000000000.0 AS es_key
              |FROM keyed ORDER BY keyed.es_key, doc_id LIMIT 50""".stripMargin),
      doc = "deterministic Efraimidis-Spirakis weighted sample without " +
        "replacement: -ln(md5-uniform)/weight keys, k smallest via " +
        "TakeOrderedAndProject — one scan, no global sort"),

    Q("x13_psi_drift",
      (s, d) => psiDrift(docs(s, d)).orderBy("bin"),
      Some(s"""WITH c AS (
              |  SELECT least(CAST(floor(n_chars / 100) AS BIGINT), 9) AS bin,
              |         sum(CASE WHEN $pctSql % 10 < 8 THEN 1 ELSE 0 END) AS n_train,
              |         sum(CASE WHEN $pctSql % 10 = 9 THEN 1 ELSE 0 END) AS n_test
              |  FROM documents GROUP BY 1),
              |t AS (SELECT sum(n_train) AS tt, sum(n_test) AS et FROM c)
              |SELECT bin, CAST(n_train AS BIGINT) AS n_train,
              |       CAST(n_test AS BIGINT) AS n_test,
              |       floor(((CAST(n_train AS DOUBLE) + 0.5) / (CAST(tt AS DOUBLE) + 5.0)
              |              - (CAST(n_test AS DOUBLE) + 0.5) / (CAST(et AS DOUBLE) + 5.0))
              |             * ln(((CAST(n_train AS DOUBLE) + 0.5) / (CAST(tt AS DOUBLE) + 5.0))
              |                  / ((CAST(n_test AS DOUBLE) + 0.5) / (CAST(et AS DOUBLE) + 5.0)))
              |             * 1000000000.0 + 0.5) / 1000000000.0 AS psi_contrib
              |FROM c, t ORDER BY bin""".stripMargin),
      doc = "PSI drift between the hash-split train and test length " +
        "distributions: per-bin contributions (engine-exact projections " +
        "of integer counts; consumers sum them — >0.2 is the alarm)"),

    Q("x3_split_counts",
      (s, d) => splitCounts(docs(s, d)).orderBy("split", "lang"),
      Some(s"""SELECT CASE WHEN $pctSql % 10 < 8 THEN 'train'
              |            WHEN $pctSql % 10 = 8 THEN 'val'
              |            ELSE 'test' END AS split,
              |       lang, count(*) AS n_docs, min(doc_id) AS first_doc
              |FROM documents GROUP BY 1, 2 ORDER BY split, lang""".stripMargin),
      doc = "reproducible train/val/test split by hash decile + per-split census"),

    Q("y5_mixture",
      (s, d) => mixture(docs(s, d), "lang",
          Seq(("en", 1, 2), ("de", 2, 1), ("es", 5, 4), ("fr", 1, 1), ("zh", 0, 1)))
        .orderBy("doc_id", "epoch"),
      Some("""WITH w(lang, num, denom) AS (
             |  VALUES ('en', 1, 2), ('de', 2, 1), ('es', 5, 4), ('fr', 1, 1), ('zh', 0, 1)),
             |j AS (
             |  SELECT doc_id, d.lang, num, denom,
             |         ('0x' || substr(md5('mix:' || CAST(doc_id AS VARCHAR)), 1, 14))::BIGINT % denom AS b
             |  FROM documents d JOIN w ON d.lang = w.lang),
             |c AS (
             |  SELECT doc_id, lang,
             |         num // denom + CASE WHEN b < num % denom THEN 1 ELSE 0 END AS n
             |  FROM j)
             |SELECT doc_id, lang, CAST(unnest(range(1, n + 1)) AS BIGINT) AS epoch
             |FROM c WHERE n > 0 ORDER BY doc_id, epoch""".stripMargin),
      doc = "deterministic dataset-mixture resampling: exact-rational epoch " +
        "factors per language (2x de, 1.25x es, 0.5x en, drop zh) via " +
        "broadcast weights + hash residual — map-only, no shuffle"),
  )
}
