package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.{Q, Tables}
import graft.functions.Parity.pround

/** Multimodal-column operators (SURVEY.md §2.G [EXT]): typed extraction
  * from JSON property blobs, and the Spark-side plumbing for opaque
  * binary media columns (schema, partitioning, batch decode shape).
  *
  * Since r13 the decode path is REAL at the container level: payloads
  * are valid minimal PNG/JPEG/WAV containers and [[parseContainerHeader]]
  * extracts dimensions/audio params from the actual bytes (big-endian
  * IHDR/SOF0, little-endian RIFF chunk walk) per partition — the shape
  * a vectorized/Arrow decode takes on a cluster. Only PIXEL/SAMPLE
  * decoding (zlib/DCT/PCM) stays out of scope: no codec libraries in
  * this container, and no registered capability needs decoded samples
  * ([[decodeBatches]] keeps that seam with a checksum stand-in).
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

  // ---- real container headers (r13, VERDICT item 6) -------------------
  //
  // The decode path behind m3/m4/m5 is no longer an arithmetic fake: the
  // payloads are REAL minimal containers (PNG signature+IHDR+IEND, JPEG
  // SOI+APP0+SOF0+EOI, WAV RIFF/fmt/data) assembled byte-for-byte in
  // codegen'd column expressions, and the decode side parses the actual
  // bytes — big-endian IHDR/SOF0 dimensions, little-endian RIFF chunk
  // walk — without ever seeing the generator's formulas. The oracle
  // checks the parse against the construction parameters (m3/m5) and
  // against a byte-identical hex rebuild of the payload (m4), so a
  // parser that misreads any offset or endianness fails the gate.
  // Chunk CRCs are zeroed (computing CRC32 in a column expression buys
  // no header fidelity); the golden-fixture spec feeds the parser a
  // REAL 1x1 PNG (correct CRCs, IDAT and all) to prove it handles
  // fully valid files too.

  /** n-byte big-endian hex of a non-negative integral column. */
  private def beHex(c: Column, n: Int): Column = lpad(hex(c), 2 * n, "0")

  /** n-byte little-endian hex of a non-negative integral column. */
  private def leHex(c: Column, n: Int): Column =
    concat((0 until n).map(i =>
      lpad(hex(shiftright(c.cast("long"), 8 * i) % 256), 2, "0")): _*)

  /** Synthetic media with REAL container headers: doc_id % 3 picks the
    * container (0 png, 1 jpeg, 2 wav); every header field is a
    * deterministic function of (doc_id, n_chars), so the oracle can
    * predict what an honest parser must extract. Assembled as one hex
    * string -> one unhex — all inside whole-stage codegen; at scale
    * this column is simply the parquet BINARY column. */
  def syntheticMedia(docs: DataFrame): DataFrame = {
    val id = col("doc_id")
    val nc = col("n_chars")
    val pngHex = concat(lit("89504E470D0A1A0A"), // signature
      lit("0000000D"), lit("49484452"),          // IHDR length + type
      beHex(nc % 640 + 1, 4), beHex(id % 480 + 1, 4),
      lit("0802000000"),                         // depth 8, RGB, no interlace
      lit("00000000"),                           // IHDR CRC (zeroed)
      lit("0000000049454E44AE426082"))           // IEND (real CRC constant)
    val jpegHex = concat(lit("FFD8"),            // SOI
      lit("FFE000104A46494600010100000100010000"), // APP0/JFIF, len 16
      lit("FFC0001108"),                         // SOF0, len 17, precision 8
      beHex(nc % 1536 + 1, 2),                   // height (BE, first in SOF0)
      beHex(id % 2048 + 1, 2),                   // width
      lit("03011100021101031101"),               // 3 components
      lit("FFD9"))                               // EOI
    val ch = id % 2 + 1
    val sr = when(id % 4 === 0, 8000L).when(id % 4 === 1, 16000L)
      .when(id % 4 === 2, 22050L).otherwise(44100L)
    val ba = ch * 2                              // 16-bit PCM
    val ds = ba * (id % 50 + 10)                 // 10-59 audio frames
    val wavHex = concat(lit("52494646"), leHex(ds + lit(36L), 4), // RIFF size
      lit("57415645"),                           // WAVE
      lit("666D7420"), lit("10000000"),          // fmt chunk, len 16
      lit("0100"), leHex(ch, 2), leHex(sr, 4),   // PCM, channels, rate
      leHex(sr * ba, 4), leHex(ba, 2), lit("1000"), // byte rate, align, bits
      lit("64617461"), leHex(ds, 4),             // data chunk + size
      expr("repeat(lpad(hex(doc_id % 256), 2, '0'), " +
        "cast((doc_id % 2 + 1) * 2 * (doc_id % 50 + 10) as int))"))
    docs.select(id, unhex(
      when(id % 3 === 0, pngHex).when(id % 3 === 1, jpegHex)
        .otherwise(wavHex)).as("media"),
      col("source"))
  }

  /** Honest container-header parse over raw bytes — PNG IHDR (big-endian
    * dims after the 8-byte signature), JPEG marker walk to SOF0-SOF3
    * (skipping APP/other segments by their declared lengths), WAV RIFF
    * chunk walk collecting fmt + data. Returns
    * (format, width, height, nChannels, sampleRate, durationMs); fields
    * that don't apply are None, anything unrecognized is "unknown". */
  private[graft] def parseContainerHeader(b: Array[Byte])
      : (String, Option[Long], Option[Long], Option[Long], Option[Long], Option[Long]) = {
    def u8(i: Int): Int = b(i) & 0xff
    def be16(i: Int): Long = ((u8(i) << 8) | u8(i + 1)).toLong
    def be32(i: Int): Long =
      (u8(i).toLong << 24) | (u8(i + 1).toLong << 16) | (u8(i + 2).toLong << 8) | u8(i + 3).toLong
    def le16(i: Int): Long = ((u8(i + 1) << 8) | u8(i)).toLong
    def le32(i: Int): Long =
      (u8(i + 3).toLong << 24) | (u8(i + 2).toLong << 16) | (u8(i + 1).toLong << 8) | u8(i).toLong
    def ascii(i: Int, n: Int): String =
      new String(b, i, n, java.nio.charset.StandardCharsets.US_ASCII)
    val unknown = ("unknown", None, None, None, None, None)
    if (b.length >= 24 && u8(0) == 0x89 && ascii(1, 3) == "PNG" &&
        u8(4) == 0x0d && u8(5) == 0x0a && u8(6) == 0x1a && u8(7) == 0x0a &&
        ascii(12, 4) == "IHDR")
      ("png", Some(be32(16)), Some(be32(20)), None, None, None)
    else if (b.length >= 4 && u8(0) == 0xff && u8(1) == 0xd8) {
      var i = 2
      while (i + 4 <= b.length) {
        if (u8(i) != 0xff) return unknown
        val marker = u8(i + 1)
        if (marker == 0xd9 || marker == 0xda) return unknown // EOI/SOS first
        val len = be16(i + 2).toInt
        if (marker >= 0xc0 && marker <= 0xc3 && i + 9 <= b.length)
          return ("jpeg", Some(be16(i + 7)), Some(be16(i + 5)), None, None, None)
        i += 2 + len
      }
      unknown
    } else if (b.length >= 12 && ascii(0, 4) == "RIFF" && ascii(8, 4) == "WAVE") {
      var i = 12
      var ch, sr, br, ds = -1L
      while (i + 8 <= b.length) {
        val id = ascii(i, 4); val sz = le32(i + 4)
        // sz comes from untrusted bytes: Int-truncating a value like
        // 0xFFFFFFF8 gives -8, zeroing or reversing the step (infinite loop
        // / negative index). Any chunk that overruns the buffer ends the
        // walk; a declared-but-truncated tail data chunk still counts.
        if (sz > (b.length - i - 8).toLong) {
          if (id == "data") ds = sz
          i = b.length
        } else {
          if (id == "fmt " && i + 24 <= b.length) {
            ch = le16(i + 10); sr = le32(i + 12); br = le32(i + 16)
          } else if (id == "data") ds = sz
          i += 8 + sz.toInt + (sz.toInt % 2) // RIFF chunks pad to even
        }
      }
      if (ch < 0 || br <= 0 || ds < 0) unknown
      else ("wav", None, None, Some(ch), Some(sr), Some(ds * 1000L / br))
    } else unknown
  }

  /** The per-partition batch decode over real container bytes: the same
    * mapPartitions seam as [[decodeBatches]] (no Exchange, 1:1 partition
    * map, (doc_id, media) input pruning) with the codec stub replaced by
    * [[parseContainerHeader]]. Output is the typed metadata row every
    * downstream consumer joins on. */
  def headerDecode(framed: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("format", StringType),
      StructField("width", LongType),
      StructField("height", LongType),
      StructField("n_channels", LongType),
      StructField("sample_rate", LongType),
      StructField("duration_ms", LongType),
      StructField("n_bytes", LongType)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    framed.select("doc_id", "media").mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        val (fmt, w, h, ch, sr, dur) = parseContainerHeader(bytes)
        Row(id, fmt, w.orNull, h.orNull, ch.orNull, sr.orNull, dur.orNull,
          bytes.length.toLong)
      }
    }(enc)
  }

  /** Deterministic fake "decode": width/height/n_frames derived from the
    * byte length. Superseded on the query surface by [[headerDecode]]
    * (m3/m5 now parse real container bytes); kept as the minimal
    * metadata shape for the decodeBatches seam spec. */
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

  /** Frame sampling over the real media BINARY: every stride-th
    * frameBytes-sized frame of the payload, reading the frame's lead
    * byte at its actual offset — pure arithmetic on the binary column,
    * no codec needed for offsets, payload never shuffles. The oracle
    * rebuilds the identical payload hex in SQL and indexes the same
    * offsets, so any byte-level disagreement in the media construction
    * OR the offset arithmetic fails the gate. */
  def frameSample(framed: DataFrame, frameBytes: Int, stride: Int): DataFrame =
    framed.select(col("doc_id"), col("media"),
      explode(expr(s"sequence(0, greatest(cast(octet_length(media) div $frameBytes as int) - 1, 0), $stride)"))
        .as("frame_no"))
      .select(col("doc_id"), col("frame_no").cast("long").as("frame_no"),
        expr(s"cast(conv(hex(substring(media, frame_no * $frameBytes + 1, 1)), 16, 10) as bigint)")
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
    // EAGER (r19): the phash table is |docs| × 5 longs — tiny next to
    // the media payloads it digests — and both join sides consume it;
    // storing it runs the interpreted higher-order band folds ONCE over
    // the corpus instead of once per side (exchange reuse did not dedup
    // the two sides' band computation).
    val ph = Materialize.frame(
      docs.select(col("doc_id"), band(0).as("b0"), band(1).as("b1"),
        band(2).as("b2"), band(3).as("b3")))
    val bands = ph.select(col("doc_id"), col("b0"), col("b1"), col("b2"),
      col("b3"), explode(expr(
        "array(struct(0 as bi, b0 as bv), struct(1 as bi, b1 as bv), " +
          "struct(2 as bi, b2 as bv), struct(3 as bi, b3 as bv))"))
        .as("bd"))
      .select(col("doc_id"), col("b0"), col("b1"), col("b2"), col("b3"),
        col("bd.bi").as("bi"), col("bd.bv").as("bv"))
    val l = bands.toDF("doc_a", "a0", "a1", "a2", "a3", "bi", "bv")
    val r = bands.toDF("doc_b", "c0", "c1", "c2", "c3", "bi", "bv")
    // r19: hamming + threshold BEFORE the pair dedup — a pair sharing k
    // bands appears k times with the SAME hamming (it is a function of
    // the pair), so filtering first and deduping (doc_a, doc_b, hamming)
    // is row-identical while the distinct's exchange carries 3 columns
    // of threshold survivors instead of 10 columns of every collision.
    l.join(r, Seq("bi", "bv")).where(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"), expr(
        """cast(bit_count(a0 ^ c0) + bit_count(a1 ^ c1)
          |  + bit_count(a2 ^ c2) + bit_count(a3 ^ c3) as bigint)"""
          .stripMargin).as("hamming"))
      .where(col("hamming") <= maxHamming)
      .distinct() // a pair sharing k bands appears k times
      .orderBy("doc_a", "doc_b")
  }
}

object MultimodalQueries {
  import Multimodal._

  /** DuckDB n-byte big-endian hex of a non-negative integral SQL expr. */
  private def beSql(e: String, n: Int): String =
    s"upper(printf('%0${2 * n}x', $e))"

  /** DuckDB n-byte little-endian hex (byte-reversed). */
  private def leSql(e: String, n: Int): String =
    (0 until n).map(i =>
      s"upper(printf('%02x', ($e) // ${1L << (8 * i)} % 256))").mkString(" || ")

  /** The container-parameter CTE shared by the m3/m4/m5 oracles — the
    * same (doc_id, n_chars)-derived fields [[Multimodal.syntheticMedia]]
    * writes into the real headers. */
  private val paramCte =
    """p AS (
      |  SELECT doc_id, n_chars, doc_id % 3 AS kind,
      |         doc_id % 2 + 1 AS ch,
      |         CASE doc_id % 4 WHEN 0 THEN 8000 WHEN 1 THEN 16000
      |              WHEN 2 THEN 22050 ELSE 44100 END AS sr,
      |         (doc_id % 2 + 1) * 2 AS ba,
      |         (doc_id % 2 + 1) * 2 * (doc_id % 50 + 10) AS ds
      |  FROM documents)""".stripMargin

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
      (s, d) => headerDecode(syntheticMedia(Tables.documents(s, d)))
        .orderBy("doc_id"),
      Some(s"""WITH $paramCte
              |SELECT doc_id,
              |       CASE kind WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg'
              |            ELSE 'wav' END AS format,
              |       CAST(CASE kind WHEN 0 THEN n_chars % 640 + 1
              |            WHEN 1 THEN doc_id % 2048 + 1 END AS BIGINT) AS width,
              |       CAST(CASE kind WHEN 0 THEN doc_id % 480 + 1
              |            WHEN 1 THEN n_chars % 1536 + 1 END AS BIGINT) AS height,
              |       CAST(CASE WHEN kind = 2 THEN ch END AS BIGINT) AS n_channels,
              |       CAST(CASE WHEN kind = 2 THEN sr END AS BIGINT) AS sample_rate,
              |       CAST(CASE WHEN kind = 2 THEN ds * 1000 // (sr * ba) END
              |            AS BIGINT) AS duration_ms,
              |       CAST(CASE kind WHEN 0 THEN 45 WHEN 1 THEN 41
              |            ELSE 44 + ds END AS BIGINT) AS n_bytes
              |FROM p ORDER BY doc_id""".stripMargin),
      doc = "REAL container-header decode (r13): payloads are valid " +
        "minimal PNG/JPEG/WAV containers built in codegen'd expressions; " +
        "an honest byte parser (BE IHDR/SOF0 dims, LE RIFF chunk walk) " +
        "extracts the metadata per partition, and the oracle checks the " +
        "parse against the construction parameters"),

    Q("m4_frame_sample",
      (s, d) => frameSample(syntheticMedia(Tables.documents(s, d)), 16, 2)
        .orderBy("doc_id", "frame_no"),
      Some(s"""WITH $paramCte,
              |pay AS (
              |  SELECT doc_id, CASE kind
              |    WHEN 0 THEN '89504E470D0A1A0A' || '0000000D49484452'
              |      || ${beSql("n_chars % 640 + 1", 4)}
              |      || ${beSql("doc_id % 480 + 1", 4)}
              |      || '0802000000' || '00000000'
              |      || '0000000049454E44AE426082'
              |    WHEN 1 THEN 'FFD8' || 'FFE000104A46494600010100000100010000'
              |      || 'FFC0001108'
              |      || ${beSql("n_chars % 1536 + 1", 2)}
              |      || ${beSql("doc_id % 2048 + 1", 2)}
              |      || '03011100021101031101' || 'FFD9'
              |    ELSE '52494646' || ${leSql("ds + 36", 4)} || '57415645'
              |      || '666D7420' || '10000000' || '0100'
              |      || ${leSql("ch", 2)} || ${leSql("sr", 4)}
              |      || ${leSql("sr * ba", 4)} || ${leSql("ba", 2)} || '1000'
              |      || '64617461' || ${leSql("ds", 4)}
              |      || repeat(upper(printf('%02x', doc_id % 256)), CAST(ds AS INT))
              |  END AS hx FROM p),
              |f AS (SELECT doc_id, hx,
              |             unnest(range(0, greatest(length(hx) // 32, 1), 2)) AS frame_no
              |      FROM pay)
              |SELECT doc_id, CAST(frame_no AS BIGINT) AS frame_no,
              |       ('0x' || substr(hx, CAST(frame_no * 32 + 1 AS INT), 2))::BIGINT
              |         AS frame_lead_byte
              |FROM f ORDER BY doc_id, frame_no""".stripMargin),
      doc = "frame sampling over the REAL media binary: every 2nd " +
        "16-byte frame's lead byte read at its actual payload offset; " +
        "the oracle rebuilds the identical container bytes in SQL and " +
        "indexes the same offsets — a byte-level end-to-end check of " +
        "the media construction and offset arithmetic"),

    Q("m5_resize",
      (s, d) => resizeMeta(
          headerDecode(syntheticMedia(Tables.documents(s, d)))
            .where(col("format") =!= "wav")
            .select(col("doc_id"), col("width"), col("height")),
          320, 240)
        .orderBy("doc_id"),
      Some("""WITH meta AS (
             |  SELECT doc_id,
             |         CAST(CASE doc_id % 3 WHEN 0 THEN n_chars % 640 + 1
             |              ELSE doc_id % 2048 + 1 END AS BIGINT) AS width,
             |         CAST(CASE doc_id % 3 WHEN 0 THEN doc_id % 480 + 1
             |              ELSE n_chars % 1536 + 1 END AS BIGINT) AS height
             |  FROM documents WHERE doc_id % 3 < 2),
             |k AS (
             |  SELECT doc_id, width, height,
             |         greatest((width + 319) // 320, (height + 239) // 240, 1) AS k
             |  FROM meta)
             |SELECT doc_id,
             |       greatest(width // k, 1) AS out_w,
             |       greatest(height // k, 1) AS out_h,
             |       greatest(width // k, 1) * greatest(height // k, 1) * 3 AS out_bytes
             |FROM k ORDER BY doc_id""".stripMargin),
      doc = "aspect-preserving integer resize of PARSED image dimensions " +
        "(the png/jpeg rows of the m3 header decode) into a 320x240 box"),

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
