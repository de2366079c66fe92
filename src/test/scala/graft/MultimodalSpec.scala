package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Tables.documents(spark, sf("sf0.001"))

  test("media framing produces a real binary column") {
    val f = Multimodal.mediaFrame(docs)
    assert(f.schema("media").dataType ===
      org.apache.spark.sql.types.BinaryType)
    assert(f.count() === docs.count())
  }

  test("decodeBatches (mapPartitions codec stub) is deterministic and total") {
    val a = Multimodal.decodeBatches(Multimodal.mediaFrame(docs))
      .as[(Long, Int, Long)].collect().sortBy(_._1)
    val b = Multimodal.decodeBatches(Multimodal.mediaFrame(docs))
      .as[(Long, Int, Long)].collect().sortBy(_._1)
    assert(a.toSeq === b.toSeq)
    assert(a.length === docs.count())
    // n_bytes matches the declarative octet_length path
    val meta = Multimodal.decodeMeta(Multimodal.mediaFrame(docs))
      .select("doc_id", "n_bytes").as[(Long, Int)].collect().toMap
    assert(a.forall { case (id, n, _) => meta(id) === n })
  }

  test("decodeBatches contract: schema, narrow partitioning, input pruning " +
      "— the seam a real codec drop-in must preserve") {
    import org.apache.spark.sql.types._
    val out = Multimodal.decodeBatches(Multimodal.mediaFrame(docs))
    // exact output schema: a real Arrow/JNI decode must return these
    // fields with these types so every downstream consumer (joins on
    // doc_id, metadata rollups) is plug-compatible
    assert(out.schema === StructType(Seq(
      StructField("doc_id", LongType),
      StructField("n_bytes", IntegerType),
      StructField("checksum", LongType))))
    // narrow execution: the decode is per-partition — no Exchange may
    // appear between the scan and the decode (a codec that forces a
    // shuffle of media payloads is wrong at 100 TB)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan.take(600))
    // partition count is preserved (mapPartitions is 1:1 over batches)
    val framed = Multimodal.mediaFrame(docs).select("doc_id", "media")
    assert(out.rdd.getNumPartitions === framed.rdd.getNumPartitions)
    // input side carries ONLY (doc_id, media) into the decode — payload
    // plus key, nothing else rides along into the codec stage
    val deser = out.queryExecution.analyzed.collectFirst {
      case d: org.apache.spark.sql.catalyst.plans.logical.DeserializeToObject => d
    }
    assert(deser.isDefined, "decode must deserialize rows per partition")
    assert(deser.get.child.output.map(_.name) === Seq("doc_id", "media"))
  }

  test("props extraction is typed (LongType) and non-null on valid JSON") {
    val k = Multimodal.propsExtract(Tables.events(spark, sf("sf0.001")))
    assert(k.schema("k").dataType === org.apache.spark.sql.types.LongType)
    assert(k.where(col("k").isNull).count() === 0)
  }

  test("resize fits the box, preserves aspect by integer factor, floors at 1") {
    val meta = Seq(
      (1L, 640, 480),  // k = max(2,2) = 2 → 320x240
      (2L, 100, 100),  // already fits → unchanged
      (3L, 1, 480),    // k = 2 → width floors at 1
      (4L, 641, 1)     // k = ceil(641/320) = 3 → 213x1
    ).toDF("doc_id", "width", "height")
    val byId = Multimodal.resizeMeta(meta, 320, 240)
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(byId(1L) === ((320L, 240L)))
    assert(byId(2L) === ((100L, 100L)))
    assert(byId(3L) === ((1L, 240L)))
    assert(byId(4L) === ((213L, 1L)))
    Multimodal.resizeMeta(meta, 320, 240).as[(Long, Long, Long, Long)]
      .collect().foreach { case (_, w, h, _) =>
        assert(w <= 320 && h <= 240 && w >= 1 && h >= 1)
      }
  }

  test("feature extraction is deterministic, 4-dim, in [0,1)") {
    val f = Multimodal.extractFeatures(docs)
      .as[(Long, Double, Double, Double, Double)].collect()
    assert(f.nonEmpty)
    f.foreach { case (_, f0, f1, f2, f3) =>
      Seq(f0, f1, f2, f3).foreach(v => assert(v >= 0.0 && v < 1.0))
    }
    val again = Multimodal.extractFeatures(docs)
      .as[(Long, Double, Double, Double, Double)].collect()
    assert(f.sortBy(_._1).toSeq === again.sortBy(_._1).toSeq)
  }

  test("frame sampling yields stride-spaced offsets starting at 0") {
    val fs = Multimodal.frameSample(docs, 64, 2)
      .groupBy("doc_id").agg(collect_list("frame_no").as("frames"))
      .as[(Long, Seq[Int])].collect()
    fs.foreach { case (_, frames) =>
      val s = frames.sorted
      assert(s.head === 0)
      assert(s.zip(s.tail).forall { case (a, b) => b - a === 2 })
    }
  }

  test("media dedup census: byte-identical payloads counted per source") {
    val d = Seq(
      (0L, "same bytes", "web", 10L),
      (1L, "same bytes", "web", 10L),   // exact copy -> 1 unique of 2
      (2L, "other bytes", "web", 11L),
      (3L, "alone", "pdf", 5L)
    ).toDF("doc_id", "text", "source", "n_chars")
    val got = Multimodal.mediaDedupCensus(d).orderBy("source")
      .as[(String, Long, Long, Double)].collect().toList
    assert(got === List(("pdf", 1L, 1L, 0.0), ("web", 3L, 2L, 0.333333)))
  }

  test("m9 phash near-dup: shared prefix pairs found, 4-bit-spread pair filtered") {
    import spark.implicits._
    // Chars with odd codes flip bits: 'a'=97 odd, 'b'=98 even.
    val base = "ab" * 32 // 64 chars, bits set at even positions of each band
    // flip ONE bit in band 0 (char 0 'a'->'b'): hamming 1 vs base -> kept.
    val oneBit = "bb" + base.substring(2)
    // flip one bit in EVERY band (chars 0,16,32,48): hamming 4 vs base
    // with NO shared band (never a candidate — correct, since 4 > 3);
    // vs oneBit it shares band 0 exactly (both flipped char 0), so the
    // banded join surfaces it and the verify keeps it at hamming 3.
    val fourBit = new StringBuilder(base)
    for (p <- Seq(0, 16, 32, 48)) fourBit.setCharAt(p, 'b')
    val d = Seq(
      (0L, base, "web", 64L), (1L, base, "web", 64L),   // exact dup: hamming 0
      (2L, oneBit, "web", 64L),                          // hamming 1 vs 0/1
      (3L, fourBit.toString, "web", 64L))                // hamming 4 vs 0/1
      .toDF("doc_id", "text", "lang", "n_chars")
      .withColumnRenamed("lang", "source")
    val got = Multimodal.phashNearDup(d)
      .as[(Long, Long, Long)].collect().toList
    // (0,3),(1,3) at hamming 4 must be filtered; (2,3) is hamming 3.
    assert(got === List((0L, 1L, 0L), (0L, 2L, 1L), (1L, 2L, 1L),
      (2L, 3L, 3L)))
  }

  test("m8 storage budget: totals, mean and ceil-rank p95 by hand") {
    import spark.implicits._
    // web payloads: 2, 4, 10 bytes -> total 16, mean 5.333333,
    // p95 rank ceil(0.95*3)=3 -> 10
    val d = Seq(
      (0L, "ab", "web", 2L), (1L, "abcd", "web", 4L),
      (2L, "0123456789", "web", 10L))
      .toDF("doc_id", "text", "source", "n_chars")
    val r = Multimodal.storageBudget(d).collect().head
    assert(r.getAs[Long]("n_media") == 3L)
    assert(r.getAs[Long]("total_bytes") == 16L)
    assert(r.getAs[Double]("mean_bytes") == 5.333333)
    assert(r.getAs[Long]("p95_bytes") == 10L)
  }

  test("norm-vs-byte dup census: whitespace variants escape byte dedup") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b"),   // canonical of both ladders
      (2L, "a  b"),  // norm-dup of 1, byte-UNIQUE: the priced miss
      (3L, "a b"),   // byte-dup (and norm-dup) of 1
      (4L, "zzz"))   // unique
      .toDF("doc_id", "text")
    val m = operators.Multimodal.normVsByteDupCensus(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(m == Map((0L, 0L) -> 2L, (1L, 0L) -> 1L, (1L, 1L) -> 1L))
    assert(!m.contains((0L, 1L)), "byte-dup implies norm-dup")
  }
}
