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
    val fs = Multimodal.frameSample(Multimodal.syntheticMedia(docs), 16, 2)
      .groupBy("doc_id").agg(collect_list("frame_no").as("frames"))
      .as[(Long, Seq[Long])].collect()
    fs.foreach { case (_, frames) =>
      val s = frames.sorted
      assert(s.head === 0L)
      assert(s.zip(s.tail).forall { case (a, b) => b - a === 2L })
    }
  }

  test("golden fixture: the parser reads a REAL 1x1 PNG (valid CRCs, IDAT and all)") {
    // the canonical 70-byte transparent 1x1 PNG — full chunk structure
    // with correct CRC32s, exactly what a real file starts with
    val png = java.util.Base64.getDecoder.decode(
      "iVBORw0KGgoAAAANSUhEUgAAAAEAAAABCAYAAAAfFcSJAAAADUlEQVR42mNkYPhfD" +
        "wAChwGA60e6kgAAAABJRU5ErkJggg==")
    assert(Multimodal.parseContainerHeader(png) ===
      (("png", Some(1L), Some(1L), None, None, None)))
  }

  test("golden fixture: JPEG marker walk skips APP0 and DQT to find SOF0") {
    def hx(s: String): Array[Byte] =
      s.replaceAll("\\s", "").grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    // SOI, APP0/JFIF, a 69-byte DQT the walker must skip by length,
    // then SOF0 with height=2 width=3 — dims live at parsed offsets,
    // not fixed positions
    val jpeg = hx("FFD8" +
      "FFE000104A46494600010100000100010000" +
      "FFDB0043" + "00" * 65 +
      "FFC0000B08" + "0002" + "0003" + "01011100" +
      "FFD9")
    assert(Multimodal.parseContainerHeader(jpeg) ===
      (("jpeg", Some(3L), Some(2L), None, None, None)))
  }

  test("golden fixture: WAV chunk walk tolerates a LIST chunk before fmt") {
    val bb = java.nio.ByteBuffer.allocate(44 + 12 + 17640)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes); bb.putInt(48 + 17640); bb.put("WAVE".getBytes)
    bb.put("LIST".getBytes); bb.putInt(4); bb.put("INFO".getBytes)
    bb.put("fmt ".getBytes); bb.putInt(16)
    bb.putShort(1); bb.putShort(2)           // PCM, stereo
    bb.putInt(44100); bb.putInt(176400)      // rate, byte rate
    bb.putShort(4); bb.putShort(16)          // block align, bits
    bb.put("data".getBytes); bb.putInt(17640) // 100 ms of audio
    val wav = java.util.Arrays.copyOf(bb.array(), bb.capacity())
    assert(Multimodal.parseContainerHeader(wav) ===
      (("wav", None, None, Some(2L), Some(44100L), Some(100L))))
  }

  test("parser rejects junk and truncated payloads as unknown, never throws") {
    val junk = Array[Byte](1, 2, 3, 4, 5, 6, 7, 8, 9, 10)
    assert(Multimodal.parseContainerHeader(junk)._1 === "unknown")
    assert(Multimodal.parseContainerHeader(Array.empty[Byte])._1 === "unknown")
    // JPEG SOI with no SOF before EOI
    val noSof = Array(0xFF, 0xD8, 0xFF, 0xD9).map(_.toByte)
    assert(Multimodal.parseContainerHeader(noSof)._1 === "unknown")
    // RIFF chunk whose declared size Int-truncates negative (0xFFFFFFF8 ->
    // -8): an unguarded walk steps 0 (infinite loop) or indexes negative
    val bomb = java.nio.ByteBuffer.allocate(24)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bomb.put("RIFF".getBytes); bomb.putInt(16); bomb.put("WAVE".getBytes)
    bomb.put("LIST".getBytes); bomb.putInt(0xFFFFFFF8); bomb.putInt(0)
    assert(Multimodal.parseContainerHeader(bomb.array())._1 === "unknown")
    // same bomb size on a data chunk after a valid fmt: the declared-but-
    // truncated data size is still reported, walk still terminates
    val tb = java.nio.ByteBuffer.allocate(44)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    tb.put("RIFF".getBytes); tb.putInt(36); tb.put("WAVE".getBytes)
    tb.put("fmt ".getBytes); tb.putInt(16)
    tb.putShort(1); tb.putShort(1); tb.putInt(8000); tb.putInt(16000)
    tb.putShort(2); tb.putShort(16)
    tb.put("data".getBytes); tb.putInt(32000) // claims 2 s, bytes absent
    assert(Multimodal.parseContainerHeader(tb.array()) ===
      (("wav", None, None, Some(1L), Some(8000L), Some(2000L))))
  }

  test("syntheticMedia containers parse back to their construction parameters") {
    val parsed = Multimodal.headerDecode(Multimodal.syntheticMedia(docs))
    // every payload is recognized — no 'unknown' leaks from the builder
    assert(parsed.where(col("format") === "unknown").count() === 0)
    val byFmt = parsed.groupBy("format").count()
      .as[(String, Long)].collect().toMap
    assert(byFmt.keySet === Set("png", "jpeg", "wav"))
    // spot-check the wav invariant the parser must derive, not copy:
    // duration_ms = data_bytes * 1000 / byte_rate with header-read fields
    val wavs = parsed.where(col("format") === "wav")
      .select("doc_id", "n_channels", "sample_rate", "duration_ms", "n_bytes")
      .as[(Long, Long, Long, Long, Long)].collect()
    wavs.foreach { case (id, ch, sr, dur, nb) =>
      assert(ch === id % 2 + 1)
      val ba = ch * 2
      val ds = nb - 44
      assert(dur === ds * 1000 / (sr * ba))
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
