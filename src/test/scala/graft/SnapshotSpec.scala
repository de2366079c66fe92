package graft

import org.apache.spark.sql.functions._

import operators.Snapshot

class SnapshotSpec extends SparkSpec {

  private def docs = Tables.documents(spark, sf("sf0.001"))

  test("upsert keeps exactly one row per key and prefers the patch") {
    val up = Snapshot.upsert(docs, Snapshot.patchBatch(docs))
    assert(up.count() == docs.count(), "patch keys all exist in base")
    assert(up.groupBy("doc_id").count().where(col("count") > 1).count() == 0)
    val patched = up.where(col("doc_id") % 7 === 0)
    assert(patched.where(col("source") =!= "patched").count() == 0,
      "every 7th doc must carry the patched version")
    assert(up.where(col("doc_id") % 7 =!= 0)
      .where(col("version") =!= 0).count() == 0,
      "non-patched docs must keep the base version")
  }

  test("diff statuses partition the union of both snapshots' keys") {
    val base = docs.select("doc_id", "source", "n_chars")
    val next = Snapshot.nextSnapshot(docs)
    val counts = Snapshot.snapshotDiff(base, next).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val keyUnion = base.select("doc_id").union(next.select("doc_id"))
      .distinct().count()
    assert(counts.values.sum == keyUnion,
      s"statuses must cover every key exactly once: $counts vs $keyUnion")
    assert(counts("added") == docs.where(col("doc_id") % 13 === 0).count())
    assert(counts("removed") ==
      docs.where(col("doc_id") % 11 === 0 && col("doc_id") % 7 =!= 0).count())
  }
}
