package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.operators.Snapshot

/** Streaming snapshot maintenance (SURVEY.md §2.E [EXT] stretch) — the
  * ingestion-time shape of [[graft.operators.Snapshot]]: a stream of
  * patch rows continuously folded into a committed corpus snapshot,
  * instead of re-merging in nightly batch.
  *
  * Production shape: `foreachBatch` turns every micro-batch into one
  * BATCH merge through the SAME [[Snapshot.upsert]] the batch path
  * uses — batch and stream cannot drift on merge semantics (the same
  * shared-code discipline as StreamFunnel/StreamDedup). Each merge
  * writes a full new version directory `v<batchId>` and relies on
  * Spark's `_SUCCESS` marker as the commit record, so readers always
  * see a complete snapshot and a mid-write crash is invisible — the
  * copy-on-write commit protocol every lakehouse format implements,
  * reduced to its observable behavior.
  *
  * Scale notes: the merge is [[Snapshot.upsert]]'s single key shuffle
  * (the arriving batch is small; with a bucketed base only the patch
  * side repartitions), and `foreachBatch` gives exactly-once version
  * publication under retries because a replayed batch id overwrites
  * its own directory, not the predecessor's. Full-snapshot rewrite per
  * batch is the honest cost of plain parquet; a real deployment points
  * the same `foreachBatch` at a format with row-level commit
  * (Delta/Iceberg) and keeps this module's code shape unchanged.
  *
  * Contract: patch batches are key-unique per micro-batch (the same
  * precondition the batch upsert documents for its patch argument).
  */
object StreamUpsert {

  private val snapshotSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** The newest COMMITTED snapshot version under `dir` (version dirs
    * `v<batchId>` holding parquet with Spark's `_SUCCESS` marker), or
    * an empty snapshot when nothing has committed yet. */
  def currentSnapshot(s: SparkSession, dir: String): DataFrame = {
    val base = new Path(dir)
    val fs = base.getFileSystem(s.sparkContext.hadoopConfiguration)
    val versions =
      if (!fs.exists(base)) Seq.empty
      else fs.listStatus(base).toSeq
        .filter(st => st.isDirectory && st.getPath.getName.startsWith("v"))
        .filter(st => fs.exists(new Path(st.getPath, "_SUCCESS")))
        .flatMap(st =>
          st.getPath.getName.drop(1).toLongOption.map(_ -> st.getPath))
    if (versions.isEmpty)
      s.createDataFrame(s.sparkContext.emptyRDD[Row], snapshotSchema)
    else s.read.schema(snapshotSchema)
      .parquet(versions.maxBy(_._1)._2.toString)
  }

  /** Fold a stream of patch rows (doc_id, source, n_chars) into the
    * snapshot at `dir`, one committed version per micro-batch. */
  def maintain(patches: DataFrame, dir: String): StreamingQuery =
    patches.writeStream
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        val s = batch.sparkSession
        Snapshot.upsert(currentSnapshot(s, dir),
            batch.select("doc_id", "source", "n_chars"))
          .select("doc_id", "source", "n_chars")
          .write.mode("overwrite").parquet(s"$dir/v$batchId")
        ()
      }
      .start()
}
