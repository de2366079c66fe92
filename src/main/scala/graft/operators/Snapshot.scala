package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Q, Tables}

/** Snapshot maintenance operators — the table-management half of a
  * training-data pipeline: upsert a patch batch into a corpus snapshot
  * (latest-version-wins merge) and diff two snapshots into a
  * change-data-capture summary.
  *
  * Design for 100 TB:
  *  - Upsert is ONE shuffle on the primary key (window rank by version,
  *    keep the newest). With a bucketed base table the shuffle drops to
  *    repartitioning only the (small) patch batch — the merge-on-read
  *    shape every lakehouse format (Delta/Iceberg/Hudi) implements.
  *  - Diff is a single full-outer join on the key, co-partitioned, with
  *    change classification as a map-side projection; counts reduce per
  *    partition before the final tiny aggregate.
  *
  * The patch batch here is derived deterministically from the base
  * corpus (every 7th doc re-sourced, every 13th appended as new, every
  * 11th dropped) so the oracle can rebuild the identical inputs.
  */
object Snapshot {

  /** Deterministic patch batch: every 7th doc re-sourced as 'patched'
    * (n_chars bumped so the change is visible in a diff). */
  def patchBatch(docs: DataFrame): DataFrame =
    docs.where(col("doc_id") % 7 === 0)
      .select(col("doc_id"), lit("patched").as("source"),
        (col("n_chars") + 1000L).as("n_chars"))

  /** New-docs batch: every 13th doc appended under a fresh id range. */
  def newBatch(docs: DataFrame): DataFrame =
    docs.where(col("doc_id") % 13 === 0)
      .select((col("doc_id") + 1000000L).as("doc_id"),
        lit("fresh").as("source"), col("n_chars"))

  /** Latest-version-wins upsert of `patch` into `base` (both keyed by
    * doc_id; patch rows carry version 1, base rows 0). */
  def upsert(base: DataFrame, patch: DataFrame): DataFrame = {
    val b = base.select(col("doc_id"), col("source"), col("n_chars"))
      .withColumn("version", lit(0))
    val p = patch.withColumn("version", lit(1))
    val w = Window.partitionBy("doc_id").orderBy(col("version").desc)
    b.unionByName(p)
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select("doc_id", "source", "n_chars", "version")
  }

  /** CDC summary between a base snapshot and its successor: per-status
    * row counts from one co-partitioned full-outer join. */
  def snapshotDiff(base: DataFrame, next: DataFrame): DataFrame = {
    val b = base.select(col("doc_id"), col("source").as("src_a"),
      col("n_chars").as("nc_a"))
    val n = next.select(col("doc_id"), col("source").as("src_b"),
      col("n_chars").as("nc_b"))
    b.join(n, Seq("doc_id"), "full_outer")
      .select(
        when(col("src_a").isNull, lit("added"))
          .when(col("src_b").isNull, lit("removed"))
          .when(col("src_a") =!= col("src_b") || col("nc_a") =!= col("nc_b"),
            lit("changed"))
          .otherwise(lit("unchanged")).as("status"))
      .groupBy("status").agg(count(lit(1)).as("n_rows"))
  }

  /** The successor snapshot used by the diff query: base minus every
    * 11th doc, with the patch upserted and the new batch appended. */
  def nextSnapshot(docs: DataFrame): DataFrame =
    upsert(docs.where(col("doc_id") % 11 =!= 0), patchBatch(docs))
      .select("doc_id", "source", "n_chars")
      .unionByName(newBatch(docs))
}

object SnapshotQueries {
  import Snapshot._
  private def docs(s: SparkSession, d: String) = Tables.documents(s, d)

  val qs: Seq[Q] = Seq(
    Q("x8_snapshot_upsert",
      (s, d) => upsert(docs(s, d), patchBatch(docs(s, d))).orderBy("doc_id"),
      Some("""WITH p AS (
             |  SELECT doc_id, 'patched' AS source, n_chars + 1000 AS n_chars, 1 AS version
             |  FROM documents WHERE doc_id % 7 = 0),
             |b AS (SELECT doc_id, source, n_chars, 0 AS version FROM documents),
             |u AS (
             |  SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY version DESC) AS rn
             |  FROM (SELECT * FROM b UNION ALL SELECT * FROM p))
             |SELECT doc_id, source, n_chars, version FROM u
             |WHERE rn = 1 ORDER BY doc_id""".stripMargin),
      doc = "latest-version-wins upsert (merge-on-read shape, one key shuffle)"),

    Q("x9_snapshot_diff",
      (s, d) => snapshotDiff(
        docs(s, d).select("doc_id", "source", "n_chars"),
        nextSnapshot(docs(s, d))).orderBy("status"),
      Some("""WITH p AS (
             |  SELECT doc_id, 'patched' AS source, n_chars + 1000 AS n_chars, 1 AS version
             |  FROM documents WHERE doc_id % 7 = 0),
             |b AS (SELECT doc_id, source, n_chars, 0 AS version
             |      FROM documents WHERE doc_id % 11 <> 0),
             |u AS (
             |  SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY version DESC) AS rn
             |  FROM (SELECT * FROM b UNION ALL SELECT * FROM p)),
             |nxt AS (
             |  SELECT doc_id, source, n_chars FROM u WHERE rn = 1
             |  UNION ALL
             |  SELECT doc_id + 1000000, 'fresh', n_chars
             |  FROM documents WHERE doc_id % 13 = 0),
             |base AS (SELECT doc_id, source, n_chars FROM documents),
             |d AS (
             |  SELECT CASE WHEN base.doc_id IS NULL THEN 'added'
             |              WHEN nxt.doc_id IS NULL THEN 'removed'
             |              WHEN base.source <> nxt.source
             |                   OR base.n_chars <> nxt.n_chars THEN 'changed'
             |              ELSE 'unchanged' END AS status
             |  FROM base FULL OUTER JOIN nxt USING (doc_id))
             |SELECT status, count(*) AS n_rows FROM d
             |GROUP BY status ORDER BY status""".stripMargin),
      doc = "snapshot CDC diff: added/removed/changed/unchanged census from " +
        "one co-partitioned full-outer join"),
  )
}
