package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.{Q, Tables}
import graft.functions.Parity.pround

/** Multimodal-column operators (SURVEY.md §2.G [EXT]): typed extraction
  * from JSON property blobs, and the Spark-side plumbing for opaque
  * binary media columns (schema, partitioning, batch decode shape).
  *
  * The real decode step (image/audio codecs) is STUBBED with a
  * deterministic fake — the codec libraries are not in this container —
  * but everything around it is real and tested: the binary column flows
  * through a typed schema, the decode runs per-partition (the shape a
  * vectorized/Arrow UDF takes on a cluster), and downstream metadata
  * aggregation is plain declarative Spark.
  */
object Multimodal {

  /** Typed props extraction: events.props is a JSON string column;
    * from_json with an explicit schema (never schema inference at scale). */
  def propsExtract(events: DataFrame): DataFrame =
    events.select(col("event_id"),
      from_json(col("props"), StructType(Seq(StructField("k", LongType))))
        .getField("k").as("k"))

  /** Media-record framing: documents become (doc_id, media binary, meta).
    * The binary is the utf-8 payload of the text — a stand-in for image
    * bytes; at scale this column comes straight from parquet BINARY. */
  def mediaFrame(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      encode(col("text"), "UTF-8").as("media"),
      col("source"), col("n_chars"))

  /** m7: media dedup census by content hash — per source, how many
    * binary payloads are byte-identical copies. The groupBy keys on the
    * md5 digest of the media column, never the payload itself, so the
    * shuffle width is 16 bytes per record however large the media is —
    * the property that makes content-hash dedup the universal first
    * pass over image/video corpora (near-dup by perceptual hash comes
    * after, exactly like text's g1 → g2 ladder). */
  def mediaDedupCensus(docs: DataFrame): DataFrame =
    mediaFrame(docs).select(col("source"), md5(col("media")).as("h"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_media"),
        countDistinct(col("h")).as("n_unique"))
      .select(col("source"), col("n_media"), col("n_unique"),
        graft.functions.Parity.pround(
          lit(1.0) - col("n_unique").cast("double") /
            col("n_media").cast("double"), 6).as("dup_rate"))

  /** m10: normalized-text vs byte-level dedup cross census — the 2×2
    * that justifies running BOTH ladders: byte-hash dedup (the media
    * first pass, m7) misses whitespace/case variants that text
    * normalization (g1) catches, and the off-diagonal cells price that
    * miss. A doc is a norm-dup when it is not g1's canonical copy of
    * its normalized text; a byte-dup when not the min-id of its exact
    * md5(payload) group. Both rules reduce per-group (16-byte digest
    * keys, payloads never shuffle), flags join on doc_id, and the
    * census is a ≤4-row rollup. byte-dup ⊆ norm-dup by construction
    * (byte-equal implies norm-equal, and min-id picks the same
    * canonical), so the (norm=0, byte=1) cell is structurally zero —
    * asserted by the spec, priced by the (1, 0) cell. */
  def normVsByteDupCensus(docs: DataFrame): DataFrame = {
    val normKeep = docs
      .select(col("doc_id"), Dedup.normText(col("text")).as("k"))
      .groupBy("k").agg(min("doc_id").as("doc_id"))
      .select(col("doc_id")).withColumn("nk", lit(1L))
    val byteKeep = docs
      .select(col("doc_id"), md5(encode(col("text"), "UTF-8")).as("k"))
      .groupBy("k").agg(min("doc_id").as("doc_id"))
      .select(col("doc_id")).withColumn("bk", lit(1L))
    docs.select(col("doc_id"))
      .join(normKeep, Seq("doc_id"), "left")
      .join(byteKeep, Seq("doc_id"), "left")
      .groupBy(when(col("nk").isNull, 1L).otherwise(0L).as("norm_dup"),
        when(col("bk").isNull, 1L).otherwise(0L).as("byte_dup"))
      .agg(count(lit(1)).as("n_docs"))
      .orderBy("norm_dup", "byte_dup")
  }

  /** Deterministic fake "decode": width/height/n_frames derived from the
    * byte length. Declarative projection — stays in whole-stage codegen. */
  def decodeMeta(framed: DataFrame): DataFrame =
    framed.select(col("doc_id"), octet_length(col("media")).as("n_bytes"))
      .select(col("doc_id"), col("n_bytes"),
        (col("n_bytes") % 640 + 1).as("width"),
        ((col("n_bytes") * 7) % 480 + 1).as("height"),
        (col("n_bytes") % 30 + 1).as("n_frames"))

  /** m8: per-source storage-budget census — count, total/mean bytes and
    * p95 payload size, the numbers a media-lake capacity plan runs on
    * (and the skew early-warning: one source's p95 racing its mean flags
    * the oversized-payload tail that will dominate decode batches).
    *
    * Scale shape: payloads never move — the first projection reduces to
    * (source, byte-size) BIN counts (the x34 discipline: windows run
    * over bins, bounded by the size domain, never records), totals are a
    * second rollup, and the p95 ceil-rank read joins the |sources|-row
    * totals back as a broadcast. */
  def storageBudget(docs: DataFrame): DataFrame = {
    val bins = mediaFrame(docs)
      .select(col("source"), octet_length(col("media")).cast("long").as("nb"))
      .groupBy("source", "nb").agg(count(lit(1)).as("cnt"))
    val tot = bins.groupBy("source")
      .agg(sum(col("nb") * col("cnt")).as("total_bytes"),
        sum("cnt").as("n_media"))
    val w = Window.partitionBy("source").orderBy("nb")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val p95 = bins.withColumn("cum", sum("cnt").over(w))
      .join(broadcast(tot.select(col("source"), col("n_media"))), "source")
      .where(col("cum") >= expr("(19 * n_media + 19) div 20"))
      .groupBy("source").agg(min("nb").as("p95_bytes"))
    tot.join(broadcast(p95), "source")
      .select(col("source"), col("n_media"), col("total_bytes"),
        pround(col("total_bytes").cast("double") /
          col("n_media").cast("double"), 6).as("mean_bytes"),
        col("p95_bytes"))
      .orderBy("source")
  }

  /** The per-partition batch-decode shape: a mapPartitions pipeline with
    * the codec call stubbed. On a cluster this is where an Arrow-batched
    * decode (or JNI codec) plugs in; partitioning and batch iteration are
    * the real thing. Not oracle-gated (the oracle can't run a codec);
    * covered by a unit spec instead. */
  def decodeBatches(framed: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("n_bytes", IntegerType),
      StructField("checksum", LongType)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    framed.select("doc_id", "media").mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        // --- codec stub: a real implementation decodes `bytes` here ---
        val checksum = bytes.foldLeft(0L)((a, b) => (a * 31 + (b & 0xff)) & 0xffffffffL)
        Row(id, bytes.length, checksum)
      }
    }(enc)
  }

  /** Deterministic "resize" of decoded media metadata: integer
    * aspect-preserving downscale into a (maxW × maxH) box. The scale
    * factor is the max of the two ceil-divided overflows — all integer
    * arithmetic, so the fake is portable to the oracle while the
    * plumbing (metadata projection feeding a resize stage) is the real
    * pipeline shape. */
  def resizeMeta(meta: DataFrame, maxW: Int, maxH: Int): DataFrame =
    meta.select(col("doc_id"), col("width"), col("height"),
        greatest(
          (col("width") + maxW - 1).divide(maxW).cast("long"),
          (col("height") + maxH - 1).divide(maxH).cast("long"),
          lit(1L)).as("k"))
      .select(col("doc_id"),
        greatest(col("width").divide(col("k")).cast("long"), lit(1L))
          .as("out_w"),
        greatest(col("height").divide(col("k")).cast("long"), lit(1L))
          .as("out_h"))
      .withColumn("out_bytes", col("out_w") * col("out_h") * 3)

  /** Deterministic fake feature extraction: a 4-dim embedding from md5 of
    * the payload, each dim a 24-bit slice scaled by 2^-24 (exact binary
    * division → bit-identical everywhere). The real path is an
    * Arrow-batched model forward pass per partition (decodeBatches shows
    * that shape); this keeps the schema and downstream joins testable. */
  def extractFeatures(docs: DataFrame): DataFrame = {
    val dims = (0 until 4).map(i =>
      (expr(s"cast(conv(substr(md5(text), ${1 + 6 * i}, 6), 16, 10) as bigint)")
        / 16777216.0).as(s"f$i"))
    docs.select(col("doc_id") +: dims: _*)
  }

  /** Frame-sampling analog: every stride-th frameBytes-sized "frame" —
    * pure arithmetic on typed columns, no codec needed for offsets. */
  def frameSample(docs: DataFrame, frameBytes: Int, stride: Int): DataFrame =
    docs.select(col("doc_id"), col("text"),
      explode(expr(s"sequence(0, greatest(cast(octet_length(encode(text, 'UTF-8')) div $frameBytes as int) - 1, 0), $stride)"))
        .as("frame_no"))
      .select(col("doc_id"), col("frame_no"),
        expr(s"ascii(substring(text, frame_no * $frameBytes + 1, 1))")
          .as("frame_lead_byte"))

  /** m9: perceptual-hash NEAR-dup — the second rung of m7's ladder
    * (content-hash exact dedup → phash near-dup, image dedup's standard
    * two-pass shape). The 64-bit "phash" is a deterministic fake
    * (codec-free container): 4 × 16-bit bands, band b's bit j set when
    * payload char 16b+j has an odd code — locality-preserving on shared
    * prefixes, which is the property the real DCT phash supplies.
    *
    * The REAL part is the banded Hamming join: each record explodes to 4
    * (band_idx, band_val) rows; candidates are pairs sharing at least one
    * band EXACTLY (equi-join on the band bucket — never an all-pairs
    * product). By pigeonhole, Hamming ≤ 3 over 4 bands forces ≥ 1
    * identical band, so the prune is LOSSLESS for the verify threshold —
    * and the oracle is the naive all-pairs join, proving exactly that.
    * Verify is bit_count over the xor'd bands on the deduped candidate
    * set. Shuffle width is 4×(2+16)B per record, never the payload. */
  def phashNearDup(docs: DataFrame, maxHamming: Int = 3): DataFrame = {
    def band(b: Int) = expr(
      s"""cast(aggregate(sequence(0, 15), 0, (acc, j) ->
         |  acc + (CASE WHEN 16 * $b + j < length(text)
         |      AND ascii(substring(text, 16 * $b + j + 1, 1)) % 2 = 1
         |    THEN shiftleft(1, j) ELSE 0 END)) as bigint)""".stripMargin)
    val ph = docs.select(col("doc_id"), band(0).as("b0"), band(1).as("b1"),
      band(2).as("b2"), band(3).as("b3"))
    val bands = ph.select(col("doc_id"), col("b0"), col("b1"), col("b2"),
      col("b3"), explode(expr(
        "array(struct(0 as bi, b0 as bv), struct(1 as bi, b1 as bv), " +
          "struct(2 as bi, b2 as bv), struct(3 as bi, b3 as bv))"))
        .as("bd"))
      .select(col("doc_id"), col("b0"), col("b1"), col("b2"), col("b3"),
        col("bd.bi").as("bi"), col("bd.bv").as("bv"))
    val l = bands.toDF("doc_a", "a0", "a1", "a2", "a3", "bi", "bv")
    val r = bands.toDF("doc_b", "c0", "c1", "c2", "c3", "bi", "bv")
    l.join(r, Seq("bi", "bv")).where(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b", "a0", "a1", "a2", "a3",
        "c0", "c1", "c2", "c3")
      .distinct() // a pair sharing k bands appears k times
      .select(col("doc_a"), col("doc_b"), expr(
        """cast(bit_count(a0 ^ c0) + bit_count(a1 ^ c1)
          |  + bit_count(a2 ^ c2) + bit_count(a3 ^ c3) as bigint)"""
          .stripMargin).as("hamming"))
      .where(col("hamming") <= maxHamming)
      .orderBy("doc_a", "doc_b")
  }
}

object MultimodalQueries {
  import Multimodal._

  val qs: Seq[Q] = Seq(
    Q("m1_props_extract",
      (s, d) => propsExtract(Tables.events(s, d)).orderBy("event_id"),
      Some("""SELECT event_id,
             |       CAST(json_extract(props, '$.k') AS BIGINT) AS k
             |FROM events ORDER BY event_id""".stripMargin),
      doc = "typed from_json extraction over the props JSON column"),

    Q("m2_props_rollup",
      (s, d) => Tables.events(s, d)
        .select(col("event_type"),
          from_json(col("props"), StructType(Seq(StructField("k", LongType))))
            .getField("k").as("k"))
        .groupBy("event_type")
        .agg(sum(col("k")).as("sum_k"), count(lit(1)).as("n"),
          pround(sum(col("k")).cast("double") / count(lit(1)), 4).as("avg_k"))
        .orderBy("event_type"),
      Some("""SELECT event_type,
             |       CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
             |       count(*) AS n,
             |       floor(CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS DOUBLE)
             |             / count(*) * 10000.0 + 0.5) / 10000.0 AS avg_k
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin),
      doc = "aggregate over JSON-extracted typed values (exact long sums)"),

    Q("m3_media_meta",
      (s, d) => decodeMeta(mediaFrame(Tables.documents(s, d)))
        .orderBy("doc_id"),
      Some("""SELECT doc_id,
             |       octet_length(encode(text)) AS n_bytes,
             |       octet_length(encode(text)) % 640 + 1 AS width,
             |       (octet_length(encode(text)) * 7) % 480 + 1 AS height,
             |       octet_length(encode(text)) % 30 + 1 AS n_frames
             |FROM documents ORDER BY doc_id""".stripMargin),
      doc = "binary media column + deterministic metadata 'decode' (codec stubbed)"),

    Q("m4_frame_sample",
      (s, d) => frameSample(Tables.documents(s, d), 64, 2)
        .select("doc_id", "frame_no", "frame_lead_byte")
        .orderBy("doc_id", "frame_no"),
      Some("""WITH f AS (
             |  SELECT doc_id, text,
             |         unnest(range(0, greatest(octet_length(encode(text)) // 64, 1), 2)) AS frame_no
             |  FROM documents)
             |SELECT doc_id, frame_no,
             |       ascii(substr(text, frame_no * 64 + 1, 1)) AS frame_lead_byte
             |FROM f ORDER BY doc_id, frame_no""".stripMargin),
      doc = "frame sampling over binary media: every 2nd 64-byte frame"),

    Q("m5_resize",
      (s, d) => resizeMeta(decodeMeta(mediaFrame(Tables.documents(s, d))),
          320, 240)
        .orderBy("doc_id"),
      Some("""WITH meta AS (
             |  SELECT doc_id,
             |         octet_length(encode(text)) % 640 + 1 AS width,
             |         (octet_length(encode(text)) * 7) % 480 + 1 AS height
             |  FROM documents),
             |k AS (
             |  SELECT doc_id, width, height,
             |         greatest((width + 319) // 320, (height + 239) // 240, 1) AS k
             |  FROM meta)
             |SELECT doc_id,
             |       greatest(width // k, 1) AS out_w,
             |       greatest(height // k, 1) AS out_h,
             |       greatest(width // k, 1) * greatest(height // k, 1) * 3 AS out_bytes
             |FROM k ORDER BY doc_id""".stripMargin),
      doc = "aspect-preserving integer resize of decoded media metadata " +
        "into a 320x240 box (codec-free deterministic fake)"),

    Q("m6_features",
      (s, d) => extractFeatures(Tables.documents(s, d)).orderBy("doc_id"),
      Some("""SELECT doc_id,
             |       ('0x' || substr(md5(text), 1, 6))::BIGINT / 16777216.0 AS f0,
             |       ('0x' || substr(md5(text), 7, 6))::BIGINT / 16777216.0 AS f1,
             |       ('0x' || substr(md5(text), 13, 6))::BIGINT / 16777216.0 AS f2,
             |       ('0x' || substr(md5(text), 19, 6))::BIGINT / 16777216.0 AS f3
             |FROM documents ORDER BY doc_id""".stripMargin),
      doc = "feature extraction stub: 4-dim md5-derived embedding, exact " +
        "2^-24 scaling (real path: Arrow-batched model pass per partition)"),

    Q("m7_media_dedup",
      (s, d) => mediaDedupCensus(Tables.documents(s, d)).orderBy("source"),
      Some("""SELECT source, count(*) AS n_media,
             |       count(DISTINCT md5(text)) AS n_unique,
             |       floor((1.0 - CAST(count(DISTINCT md5(text)) AS DOUBLE)
             |              / CAST(count(*) AS DOUBLE)) * 1000000.0 + 0.5)
             |         / 1000000.0 AS dup_rate
             |FROM documents GROUP BY source ORDER BY source""".stripMargin),
      doc = "media dedup census by content hash: the first pass of image " +
        "dedup - per source, how many payloads are byte-identical copies; " +
        "groupBy keys on the 128-bit digest, never the payload"),

    Q("m8_storage_budget",
      (s, d) => storageBudget(Tables.documents(s, d)),
      Some("""WITH b AS (
             |  SELECT source, CAST(octet_length(encode(text)) AS BIGINT) AS nb,
             |         count(*) AS cnt
             |  FROM documents GROUP BY 1, 2),
             |t AS (SELECT source, CAST(sum(nb * cnt) AS BIGINT) AS total_bytes,
             |             CAST(sum(cnt) AS BIGINT) AS n_media
             |      FROM b GROUP BY 1),
             |c AS (
             |  SELECT source, nb, cnt, n_media,
             |         sum(cnt) OVER (PARTITION BY source ORDER BY nb
             |           ROWS UNBOUNDED PRECEDING) AS cum
             |  FROM b JOIN t USING (source)),
             |p AS (SELECT source, min(nb) AS p95_bytes FROM c
             |      WHERE cum >= (19 * n_media + 19) // 20 GROUP BY 1)
             |SELECT source, n_media, total_bytes,
             |       floor(CAST(total_bytes AS DOUBLE) / CAST(n_media AS DOUBLE)
             |             * 1000000.0 + 0.5) / 1000000.0 AS mean_bytes,
             |       p95_bytes
             |FROM t JOIN p USING (source) ORDER BY source""".stripMargin),
      doc = "per-source media storage budget (count, total/mean bytes, " +
        "p95 payload): payloads never move — (source, size) bin counts, " +
        "second rollup, broadcast ceil-rank p95 read"),

    Q("m9_phash_neardup",
      (s, d) => phashNearDup(Tables.documents(s, d)),
      Some("""WITH p AS (
             |  SELECT doc_id,
             |         CAST(list_sum(list_transform(range(0, 16), j ->
             |           CASE WHEN 0 + j < len(text)
             |               AND unicode(substr(text, CAST(0 + j + 1 AS INT), 1)) % 2 = 1
             |             THEN (1 << j) ELSE 0 END)) AS BIGINT) AS b0,
             |         CAST(list_sum(list_transform(range(0, 16), j ->
             |           CASE WHEN 16 + j < len(text)
             |               AND unicode(substr(text, CAST(16 + j + 1 AS INT), 1)) % 2 = 1
             |             THEN (1 << j) ELSE 0 END)) AS BIGINT) AS b1,
             |         CAST(list_sum(list_transform(range(0, 16), j ->
             |           CASE WHEN 32 + j < len(text)
             |               AND unicode(substr(text, CAST(32 + j + 1 AS INT), 1)) % 2 = 1
             |             THEN (1 << j) ELSE 0 END)) AS BIGINT) AS b2,
             |         CAST(list_sum(list_transform(range(0, 16), j ->
             |           CASE WHEN 48 + j < len(text)
             |               AND unicode(substr(text, CAST(48 + j + 1 AS INT), 1)) % 2 = 1
             |             THEN (1 << j) ELSE 0 END)) AS BIGINT) AS b3
             |  FROM documents)
             |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             |       CAST(bit_count(xor(a.b0, b.b0)) + bit_count(xor(a.b1, b.b1))
             |          + bit_count(xor(a.b2, b.b2)) + bit_count(xor(a.b3, b.b3))
             |         AS BIGINT) AS hamming
             |FROM p a JOIN p b ON a.doc_id < b.doc_id
             |WHERE bit_count(xor(a.b0, b.b0)) + bit_count(xor(a.b1, b.b1))
             |    + bit_count(xor(a.b2, b.b2)) + bit_count(xor(a.b3, b.b3)) <= 3
             |ORDER BY doc_a, doc_b""".stripMargin),
      doc = "perceptual-hash near-dup (m7's second rung): 4x16-bit banded " +
        "Hamming join — candidates share >=1 exact band (pigeonhole makes " +
        "the prune LOSSLESS for hamming<=3; the oracle is the naive " +
        "all-pairs join, proving it), verify on the deduped candidate " +
        "set, 72-byte shuffle width however large the media payload"),

    Q("m10_norm_vs_byte_dup",
      (s, d) => normVsByteDupCensus(Tables.documents(s, d)),
      Some("""WITH nk AS (
             |  SELECT min(doc_id) AS doc_id
             |  FROM (SELECT doc_id,
             |               lower(trim(regexp_replace(text, '[ \t\n\r\f]+', ' ', 'g'))) AS k
             |        FROM documents)
             |  GROUP BY k),
             |bk AS (
             |  SELECT min(doc_id) AS doc_id
             |  FROM (SELECT doc_id, md5(text) AS k FROM documents)
             |  GROUP BY k)
             |SELECT CASE WHEN nk.doc_id IS NULL THEN 1 ELSE 0 END AS norm_dup,
             |       CASE WHEN bk.doc_id IS NULL THEN 1 ELSE 0 END AS byte_dup,
             |       CAST(count(*) AS BIGINT) AS n_docs
             |FROM documents d
             |LEFT JOIN nk ON nk.doc_id = d.doc_id
             |LEFT JOIN bk ON bk.doc_id = d.doc_id
             |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),
      doc = "normalized-text vs byte-hash dedup cross census (the 2x2 " +
        "that prices what byte-level media dedup misses): both rules " +
        "reduce on 16-byte digest keys, flags join on doc_id, <=4-row " +
        "rollup; the (norm=0, byte=1) cell is structurally zero"),
  )
}
