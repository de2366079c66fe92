package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Q, Tables}
import graft.functions.Parity.{pround, proundSql}

/** Corpus/data profiling — the distribution statistics a training-data
  * pipeline computes before and after each filtering stage (what fraction
  * of docs survive a length cut, where the quality threshold should sit,
  * how skewed the per-language mix is).
  *
  * Percentiles are EXACT rank-based selections (`row_number` over a
  * per-group window with a total order), not `percentile_approx`:
  * approximate sketches are engine-specific and would never hash-match a
  * DuckDB oracle, while the rank rule `rn = ceil(p * n)` is deterministic
  * in any engine. At 100 TB you'd flip `exactPercentiles` to
  * `percentile_approx` (one pass, mergeable sketch, no per-group sort) —
  * the query shape stays the same; the window variant is the
  * correctness-checkable reference implementation.
  */
object Profiling {

  /** Exact p50/p95 of `valueCol` per `keyCol`, tie-broken by `tieCol` so
    * the selected row is unique. */
  def exactPercentiles(df: DataFrame, keyCol: String, valueCol: String,
                       tieCol: String): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(col(valueCol), col(tieCol))
    val n = Window.partitionBy(keyCol)
    df.select(col(keyCol), col(valueCol),
        row_number().over(w).as("rn"), count(lit(1)).over(n).as("n"))
      .groupBy(keyCol)
      .agg(
        min(when(col("rn") === ceil(col("n") * 0.5), col(valueCol))).as("p50"),
        min(when(col("rn") === ceil(col("n") * 0.95), col(valueCol))).as("p95"))
  }

  /** Fixed-width histogram of `valueCol` with an overflow bucket:
    * bucket = min(floor(v / width), maxBucket). */
  def histogram(df: DataFrame, valueCol: String, width: Double,
                maxBucket: Long): DataFrame =
    df.select(
        least(floor(col(valueCol) / width), lit(maxBucket)).cast("long")
          .as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("n"))

  /** Sketch-based approximate quantiles: quantize values to integer
    * centi-bins, reduce to (group, bin, count) — a MERGEABLE sketch whose
    * size is bounded by the value range, not the row count — then read
    * p50/p95 off the cumulative bin counts (upper edge of the first bin
    * whose running count reaches ceil(p·n)). This is the one-pass
    * 100 TB quantile path (same contract as percentile_approx but
    * engine-portable): the shuffle moves only bin counts, never rows,
    * and bin tables from different partitions/days merge by addition.
    * Bias is bounded by the bin width (1 centi-unit). */
  def sketchQuantiles(df: DataFrame, keyCol: String, valueCol: String): DataFrame = {
    val bins = df
      .select(col(keyCol), floor(col(valueCol) * 100.0).cast("long").as("bin"))
      .groupBy(keyCol, "bin").agg(count(lit(1)).as("c"))
    val w = Window.partitionBy(keyCol).orderBy("bin")
    val n = Window.partitionBy(keyCol)
    bins
      .select(col(keyCol), col("bin"), col("c"),
        sum(col("c")).over(w).as("cum"), sum(col("c")).over(n).as("n"))
      .groupBy(keyCol)
      .agg(
        min(when(col("cum") >= ceil(col("n") * 0.5), col("bin"))).as("b50"),
        min(when(col("cum") >= ceil(col("n") * 0.95), col("bin"))).as("b95"))
      .select(col(keyCol),
        ((col("b50") + 1L).cast("double") / 100.0).as("p50_approx"),
        ((col("b95") + 1L).cast("double") / 100.0).as("p95_approx"))
  }

  /** p7: referential-integrity census over the star schema — per
    * foreign-key relationship, how many child rows point at a missing
    * parent. The join-health guardrail a warehouse asserts before
    * promoting a snapshot: orphans silently vanish from inner joins, so
    * a nonzero count here explains "missing revenue" before anyone
    * debugs a query.
    *
    * Scale shape: each relationship is ONE left-anti equi-join counted —
    * the canonical orphan plan (never a NOT IN subquery, which
    * null-poisons; never a collect). Parent key sets are distinct-
    * reduced before the join; at 100 TB these are the same shuffles the
    * production joins already pay, and AQE broadcasts genuinely small
    * parents. Output is |relationships| rows. */
  def fkOrphans(child: DataFrame, childKey: String, parent: DataFrame,
                parentKey: String, name: String): DataFrame = {
    // ONE pass over the child (r20): the old shape scanned it twice —
    // once for the row count, once for the anti-join — and crossJoined
    // two 1-row aggregates (two extra SinglePartition exchanges). The
    // parent side is key-DISTINCT, so a left join cannot fan out and
    // count(marker is null) is exactly the anti-join count. At 100 TB
    // the child is the fact table — halving its scans is the whole
    // cost of this census.
    val keys = parent.select(col(parentKey)).distinct()
      .withColumn("pk_hit", lit(1))
    child.select(col(childKey))
      .join(keys, col(childKey) === col(parentKey), "left")
      .agg(count(lit(1)).as("n_child"),
        coalesce(sum(when(col("pk_hit").isNull, 1L).otherwise(0L)), lit(0L))
          .as("n_orphans"))
      .select(lit(name).as("relationship"), col("n_child"), col("n_orphans"))
  }

  /** All four star-schema FK relationships in one census. */
  def fkCensus(s: SparkSession, d: String): DataFrame =
    Seq(
      fkOrphans(Tables.lineitem(s, d), "l_orderkey",
        Tables.orders(s, d), "o_orderkey", "lineitem->orders"),
      fkOrphans(Tables.lineitem(s, d), "l_partkey",
        Tables.part(s, d), "p_partkey", "lineitem->part"),
      fkOrphans(Tables.lineitem(s, d), "l_suppkey",
        Tables.supplier(s, d), "s_suppkey", "lineitem->supplier"),
      fkOrphans(Tables.orders(s, d), "o_custkey",
        Tables.customer(s, d), "c_custkey", "orders->customer"))
      .reduce(_ unionByName _)
      .orderBy("relationship")

  /** p11: primary-key uniqueness census across the whole schema — the
    * other half of p7's referential gate: duplicate keys silently FAN
    * OUT joins (each dup multiplies matching rows), so a warehouse
    * asserts key-distinct == rows before promoting any snapshot. One
    * combinable (count, distinct) aggregate per table, |tables| rows;
    * the 100 TB swap is p6's: approx_count_distinct as the cheap
    * screen, exact only on failures. */
  def pkCensus(s: SparkSession, d: String): DataFrame =
    Seq("customer" -> "c_custkey", "supplier" -> "s_suppkey",
      "part" -> "p_partkey", "orders" -> "o_orderkey",
      "events" -> "event_id", "documents" -> "doc_id",
      "embeddings" -> "vec_id")
      .map { case (t, k) =>
        Tables.table(s, d, t).agg(count(lit(1)).as("n_rows"),
          countDistinct(col(k)).as("n_distinct"))
          .select(lit(t).as("table_name"), col("n_rows"), col("n_distinct"),
            (col("n_rows") - col("n_distinct")).as("n_dup_keys"))
      }
      .reduce(_ unionByName _)
      .orderBy("table_name")

  /** p12: surrogate-id continuity census — for each dense-keyed table,
    * span(max − min + 1) vs row count: a nonzero hole count on a
    * generator-dense key is the signature of a silently dropped ingest
    * partition (rows vanish but nothing errors — the failure p7/p11
    * cannot see because the surviving rows are internally consistent).
    * Pure min/max/count aggregates — NO sort, no window, no lag over
    * row-scale data — so the census costs one combinable pass per
    * table. */
  def idContinuity(s: SparkSession, d: String): DataFrame =
    Seq("customer" -> "c_custkey", "part" -> "p_partkey",
      "orders" -> "o_orderkey", "events" -> "event_id",
      "documents" -> "doc_id", "embeddings" -> "vec_id")
      .map { case (t, k) =>
        Tables.table(s, d, t).agg(count(lit(1)).as("n_rows"),
          min(col(k)).cast("long").as("min_id"),
          max(col(k)).cast("long").as("max_id"))
          .select(lit(t).as("table_name"), col("n_rows"), col("min_id"),
            col("max_id"),
            (col("max_id") - col("min_id") + 1L - col("n_rows"))
              .as("n_holes"))
      }
      .reduce(_ unionByName _)
      .orderBy("table_name")

  /** p6: whole-table column profile — one row per column with its null
    * count and exact distinct cardinality, the "describe" every ingest
    * pipeline runs first (keys should be distinct ≈ rows, enums should
    * be tiny, nullable columns should justify themselves).
    *
    * Shape: ONE aggregate computes every column's counters (Catalyst
    * plans the multi-distinct via a single Expand — |cols|× the scan
    * rows in flight, map-side combined before the exchange), then a
    * zero-shuffle `stack` unpivots the single result row to |cols|
    * rows. At 100 TB you'd swap the exact distincts for
    * approx_count_distinct (or the mergeable x4/x10 HLL register
    * tables) — one config knob in a real deployment; exact is kept here
    * because the profile is the oracle-gated reference. */
  def columnProfile(df: DataFrame): DataFrame = {
    val cols = df.columns.toSeq
    val aggs = cols.flatMap(c => Seq(
      sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"n_$c"),
      countDistinct(col(c)).as(s"d_$c")))
    val stackArgs = cols.map(c => s"'$c', `n_$c`, `d_$c`").mkString(", ")
    df.agg(aggs.head, aggs.tail: _*)
      .select(expr(s"stack(${cols.length}, $stackArgs)" +
        " as (column_name, n_nulls, n_distinct)"))
      .orderBy("column_name")
  }

  /** p8: profile DRIFT between the first and second half of the event
    * stream — p6's census, two periods, one pass: did a column's null
    * rate or cardinality shift between deploy windows? The split point
    * is the midpoint calendar day from one broadcast min/max row (never
    * a median over facts); per column, null counts and exact distincts
    * for BOTH periods compile into ONE multi-distinct aggregate (the
    * p6 single-Expand shape — conditional distincts, so no second scan
    * and no join between periods), then a zero-shuffle stack unpivot.
    * The 100 TB swap is the same as p6's: approx_count_distinct. */
  def schemaDrift(events: DataFrame, cols: Seq[String] =
      Seq("event_type", "props", "user_id", "value")): DataFrame = {
    val withDay = events
      .withColumn("day", expr("unix_timestamp(ts) div 86400"))
    val bounds = withDay.agg(min("day").as("d0"), max("day").as("d1"))
    val p = withDay.crossJoin(broadcast(bounds))
      .withColumn("period",
        when(col("day") < expr("d0 + (d1 - d0 + 1) div 2"), "a")
          .otherwise("b"))
    val aggs = cols.flatMap(c => Seq(
      sum(when(col("period") === "a" && col(c).isNull, 1L).otherwise(0L))
        .as(s"na_$c"),
      sum(when(col("period") === "b" && col(c).isNull, 1L).otherwise(0L))
        .as(s"nb_$c"),
      countDistinct(when(col("period") === "a", col(c))).as(s"da_$c"),
      countDistinct(when(col("period") === "b", col(c))).as(s"db_$c"))) ++
      Seq(sum(when(col("period") === "a", 1L).otherwise(0L)).as("rows_a"),
        sum(when(col("period") === "b", 1L).otherwise(0L)).as("rows_b"))
    val stackArgs = cols
      .map(c => s"'$c', `na_$c`, `nb_$c`, `da_$c`, `db_$c`").mkString(", ")
    p.agg(aggs.head, aggs.tail: _*)
      .select(col("rows_a"), col("rows_b"),
        expr(s"stack(${cols.length}, $stackArgs)" +
          " as (column_name, nulls_a, nulls_b, distinct_a, distinct_b)"))
      .select("column_name", "rows_a", "rows_b", "nulls_a", "nulls_b",
        "distinct_a", "distinct_b")
      .orderBy("column_name")
  }


  /** p9: zone-map skip census — would min/max footer stats let a
    * date-range predicate skip whole files? Rows bucket by the physical
    * write order proxy (l_orderkey div 8192 ≈ one row-group), each
    * bucket reduces to its [min, max] l_shipdate zone (one combinable
    * groupBy — the shuffle moves one row per bucket), and the census
    * reports how many zones a fixed summer-quarter predicate prunes and
    * what fraction of rows the surviving zones force a scan of. The
    * physical-design read behind "is this table date-clustered enough,
    * or does it need a z-order/sort rewrite (x6)?" — on TPC-H-shaped
    * data orderkey order correlates with orderdate, so skipping is
    * partial but real. Everything is exact integers except the two
    * 6-dp fractions. */
  def zoneMapSkips(lineitem: DataFrame,
      lo: String = "1995-06-01", hi: String = "1995-09-01"): DataFrame = {
    // boundary days as exact epoch-day integers — no timestamp-literal
    // cast parity to get wrong between engines
    val loD = java.time.LocalDate.parse(lo).toEpochDay
    val hiD = java.time.LocalDate.parse(hi).toEpochDay
    val zones = lineitem
      .select(expr("l_orderkey div 8192").as("bucket"),
        expr("unix_timestamp(l_shipdate) div 86400").as("day"))
      .select(col("bucket"), col("day"),
        (col("day") >= loD && col("day") < hiD).cast("long").as("hit"))
      .groupBy("bucket")
      .agg(min("day").as("zmin"), max("day").as("zmax"),
        count(lit(1)).as("rows"), sum("hit").as("matched"))
    zones.agg(
      count(lit(1)).as("n_zones"),
      sum(expr(s"case when zmax < ${loD}L or zmin >= ${hiD}L then 1L else 0L end"))
        .as("n_skipped"),
      sum("rows").as("n_rows"),
      sum(expr(s"case when zmax < ${loD}L or zmin >= ${hiD}L then 0L else rows end"))
        .as("rows_scanned"),
      sum("matched").as("rows_matched"))
      .select(col("n_zones"), col("n_skipped"),
        pround(col("n_skipped").cast("double") / col("n_zones").cast("double"), 6)
          .as("skip_frac"),
        col("n_rows"), col("rows_scanned"), col("rows_matched"),
        pround(col("rows_scanned").cast("double") / col("n_rows").cast("double"), 6)
          .as("scan_frac"))
  }
  /** p10: sketch-calibration census — per column, the exact distinct
    * count next to the 64-register HLL estimate and its relative
    * error: the evidence behind p6's "at 100 TB swap exact distincts
    * for sketches" note, measured on THIS data instead of asserted.
    * One unpivot pass (stack — no per-column re-scan) feeds the same
    * mergeable register kernel x4/x10 use; doubles unpivot through
    * exact cents so both engines stringify identical integers (float
    * formatting is not engine-portable). */
  def hllCalibration(events: DataFrame): DataFrame =
    Stats.hllDistinctPerGroup(
      events.selectExpr(
        "stack(4, 'event_type', cast(event_type as string), " +
          "'props', cast(props as string), " +
          "'user_id', cast(user_id as string), " +
          "'value_cents', cast(cast(floor(value * 100.0 + 0.5) as bigint) as string)) " +
          "as (column_name, v)")
        .where(col("v").isNotNull),
      "column_name", "v")
      .select(col("column_name"), col("exact_distinct"),
        col("nonzero_registers"), col("hll_estimate"),
        pround((col("hll_estimate") - col("exact_distinct").cast("double"))
          / col("exact_distinct").cast("double"), 6).as("rel_err"))
      .orderBy("column_name")
}
object ProfilingQueries {
  val qs: Seq[Q] = Seq(
    Q("p1_value_percentiles",
      (s, d) => Profiling.exactPercentiles(
          Tables.events(s, d), "event_type", "value", "event_id")
        .orderBy("event_type"),
      Some("""WITH r AS (
             |  SELECT event_type, value,
             |         row_number() OVER (PARTITION BY event_type
             |                            ORDER BY value, event_id) AS rn,
             |         count(*) OVER (PARTITION BY event_type) AS n
             |  FROM events)
             |SELECT event_type,
             |       min(CASE WHEN rn = CAST(ceil(n * 0.5) AS BIGINT) THEN value END) AS p50,
             |       min(CASE WHEN rn = CAST(ceil(n * 0.95) AS BIGINT) THEN value END) AS p95
             |FROM r GROUP BY event_type ORDER BY event_type""".stripMargin),
      doc = "exact rank-based p50/p95 per group (portable percentile; " +
        "percentile_approx is the 100 TB variant)"),

    Q("p2_length_histogram",
      (s, d) => Profiling.histogram(Tables.documents(s, d), "n_chars",
          500.0, 10L)
        .orderBy("bucket"),
      Some("""SELECT CAST(least(floor(n_chars / 500.0), 10) AS BIGINT) AS bucket,
             |       count(*) AS n
             |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin),
      doc = "doc-length histogram with overflow bucket (filter-stage profiling)"),

    Q("p3_lang_profile",
      (s, d) => Tables.documents(s, d)
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          min(col("n_chars")).as("min_chars"),
          max(col("n_chars")).as("max_chars"),
          pround(sum(col("n_chars")).cast("double") / count(lit(1)), 4)
            .as("avg_chars"))
        .orderBy("lang"),
      Some(s"""SELECT lang, count(*) AS n_docs,
              |       min(n_chars) AS min_chars, max(n_chars) AS max_chars,
              |       ${proundSql("CAST(CAST(sum(n_chars) AS BIGINT) AS DOUBLE) / count(*)", 4)} AS avg_chars
              |FROM documents GROUP BY lang ORDER BY lang""".stripMargin),
      doc = "per-language corpus mix: counts + length envelope + exact avg"),

    Q("p4_sketch_quantiles",
      (s, d) => Profiling.sketchQuantiles(Tables.events(s, d),
          "event_type", "value")
        .orderBy("event_type"),
      Some("""WITH bins AS (
             |  SELECT event_type, CAST(floor(value * 100.0) AS BIGINT) AS bin,
             |         count(*) AS c
             |  FROM events GROUP BY event_type, bin),
             |cum AS (
             |  SELECT event_type, bin, c,
             |         sum(c) OVER (PARTITION BY event_type ORDER BY bin) AS cum,
             |         sum(c) OVER (PARTITION BY event_type) AS n
             |  FROM bins),
             |q AS (
             |  SELECT event_type,
             |         min(CASE WHEN cum >= ceil(n * 0.5) THEN bin END) AS b50,
             |         min(CASE WHEN cum >= ceil(n * 0.95) THEN bin END) AS b95
             |  FROM cum GROUP BY event_type)
             |SELECT event_type,
             |       CAST(b50 + 1 AS DOUBLE) / 100.0 AS p50_approx,
             |       CAST(b95 + 1 AS DOUBLE) / 100.0 AS p95_approx
             |FROM q ORDER BY event_type""".stripMargin),
      doc = "mergeable bin-count quantile sketch: shuffle moves bin counts, " +
        "not rows — the portable percentile_approx shape"),

    Q("p5_data_quality",
      (s, d) => Tables.events(s, d).agg(
        count(lit(1)).as("n_rows"),
        sum(when(col("props").isNull, 1L).otherwise(0L)).as("n_null_props"),
        sum(when(col("value") < 0.0, 1L).otherwise(0L)).as("n_neg_value"),
        countDistinct(col("event_type")).as("n_event_types"),
        (count(lit(1)) - countDistinct(col("event_id"))).as("n_dup_ids"),
        min(col("ts")).as("ts_min"), max(col("ts")).as("ts_max")),
      Some("""SELECT count(*) AS n_rows,
             |       CAST(sum(CASE WHEN props IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null_props,
             |       CAST(sum(CASE WHEN value < 0.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_neg_value,
             |       count(DISTINCT event_type) AS n_event_types,
             |       count(*) - count(DISTINCT event_id) AS n_dup_ids,
             |       min(ts) AS ts_min, max(ts) AS ts_max
             |FROM events""".stripMargin),
      doc = "single-pass data-quality report (null/range/duplicate/coverage " +
        "guardrails a pipeline asserts before promoting a snapshot)"),

    Q("p6_column_profile",
      (s, d) => Profiling.columnProfile(Tables.orders(s, d)),
      Some("""SELECT * FROM (
             |  SELECT 'o_orderkey' AS column_name,
             |         count(*) - count(o_orderkey) AS n_nulls,
             |         count(DISTINCT o_orderkey) AS n_distinct FROM orders
             |  UNION ALL
             |  SELECT 'o_custkey', count(*) - count(o_custkey),
             |         count(DISTINCT o_custkey) FROM orders
             |  UNION ALL
             |  SELECT 'o_orderstatus', count(*) - count(o_orderstatus),
             |         count(DISTINCT o_orderstatus) FROM orders
             |  UNION ALL
             |  SELECT 'o_totalprice', count(*) - count(o_totalprice),
             |         count(DISTINCT o_totalprice) FROM orders
             |  UNION ALL
             |  SELECT 'o_orderdate', count(*) - count(o_orderdate),
             |         count(DISTINCT o_orderdate) FROM orders
             |  UNION ALL
             |  SELECT 'o_orderpriority', count(*) - count(o_orderpriority),
             |         count(DISTINCT o_orderpriority) FROM orders
             |) ORDER BY column_name""".stripMargin),
      doc = "whole-table column profile (nulls + exact distincts per " +
        "column): one multi-distinct aggregate (single Expand), " +
        "zero-shuffle stack unpivot; approx_count_distinct is the " +
        "documented 100 TB swap"),

    Q("p7_fk_orphans",
      (s, d) => Profiling.fkCensus(s, d),
      Some("""SELECT * FROM (
             |  SELECT 'lineitem->orders' AS relationship,
             |         (SELECT count(*) FROM lineitem) AS n_child,
             |         (SELECT count(*) FROM lineitem WHERE l_orderkey NOT IN
             |            (SELECT o_orderkey FROM orders WHERE o_orderkey IS NOT NULL))
             |           AS n_orphans
             |  UNION ALL
             |  SELECT 'lineitem->part',
             |         (SELECT count(*) FROM lineitem),
             |         (SELECT count(*) FROM lineitem WHERE l_partkey NOT IN
             |            (SELECT p_partkey FROM part WHERE p_partkey IS NOT NULL))
             |  UNION ALL
             |  SELECT 'lineitem->supplier',
             |         (SELECT count(*) FROM lineitem),
             |         (SELECT count(*) FROM lineitem WHERE l_suppkey NOT IN
             |            (SELECT s_suppkey FROM supplier WHERE s_suppkey IS NOT NULL))
             |  UNION ALL
             |  SELECT 'orders->customer',
             |         (SELECT count(*) FROM orders),
             |         (SELECT count(*) FROM orders WHERE o_custkey NOT IN
             |            (SELECT c_custkey FROM customer WHERE c_custkey IS NOT NULL))
             |) ORDER BY relationship""".stripMargin),
      doc = "referential-integrity census (orphan FKs per relationship): " +
        "one left-anti equi-join per FK — never NOT IN (the oracle works " +
        "around its null-poisoning explicitly), never a collect"),

    Q("p8_schema_drift",
      (s, d) => Profiling.schemaDrift(Tables.events(s, d)),
      Some("""WITH e AS (
             |  SELECT *, CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day
             |  FROM events),
             |b AS (SELECT min(day) AS d0, max(day) AS d1 FROM e),
             |p AS (SELECT e.*, CASE WHEN day < d0 + (d1 - d0 + 1) // 2
             |        THEN 'a' ELSE 'b' END AS period
             |      FROM e CROSS JOIN b),
             |t AS (SELECT CAST(sum(CASE WHEN period = 'a' THEN 1 ELSE 0 END) AS BIGINT) AS rows_a,
             |             CAST(sum(CASE WHEN period = 'b' THEN 1 ELSE 0 END) AS BIGINT) AS rows_b
             |      FROM p)
             |SELECT column_name, rows_a, rows_b, nulls_a, nulls_b,
             |       distinct_a, distinct_b
             |FROM (
             |  SELECT 'event_type' AS column_name,
             |         CAST(sum(CASE WHEN period = 'a' AND event_type IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nulls_a,
             |         CAST(sum(CASE WHEN period = 'b' AND event_type IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nulls_b,
             |         count(DISTINCT CASE WHEN period = 'a' THEN event_type END) AS distinct_a,
             |         count(DISTINCT CASE WHEN period = 'b' THEN event_type END) AS distinct_b
             |  FROM p
             |  UNION ALL
             |  SELECT 'props',
             |         CAST(sum(CASE WHEN period = 'a' AND props IS NULL THEN 1 ELSE 0 END) AS BIGINT),
             |         CAST(sum(CASE WHEN period = 'b' AND props IS NULL THEN 1 ELSE 0 END) AS BIGINT),
             |         count(DISTINCT CASE WHEN period = 'a' THEN props END),
             |         count(DISTINCT CASE WHEN period = 'b' THEN props END)
             |  FROM p
             |  UNION ALL
             |  SELECT 'user_id',
             |         CAST(sum(CASE WHEN period = 'a' AND user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT),
             |         CAST(sum(CASE WHEN period = 'b' AND user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT),
             |         count(DISTINCT CASE WHEN period = 'a' THEN user_id END),
             |         count(DISTINCT CASE WHEN period = 'b' THEN user_id END)
             |  FROM p
             |  UNION ALL
             |  SELECT 'value',
             |         CAST(sum(CASE WHEN period = 'a' AND value IS NULL THEN 1 ELSE 0 END) AS BIGINT),
             |         CAST(sum(CASE WHEN period = 'b' AND value IS NULL THEN 1 ELSE 0 END) AS BIGINT),
             |         count(DISTINCT CASE WHEN period = 'a' THEN value END),
             |         count(DISTINCT CASE WHEN period = 'b' THEN value END)
             |  FROM p
             |) CROSS JOIN t ORDER BY column_name""".stripMargin),
      doc = "profile drift between stream halves (p6 x 2 periods, one " +
        "pass): midpoint-day split from a broadcast min/max row, " +
        "conditional null + exact-distinct counters for both periods in " +
        "ONE multi-distinct aggregate — no second scan, no period join"),

    Q("p9_zonemap_skips",
      (s, d) => Profiling.zoneMapSkips(Tables.lineitem(s, d)),
      Some {
        val loD = java.time.LocalDate.parse("1995-06-01").toEpochDay
        val hiD = java.time.LocalDate.parse("1995-09-01").toEpochDay
        s"""WITH dd AS (
           |  SELECT l_orderkey // 8192 AS bucket,
           |         CAST(floor(epoch(l_shipdate)) AS BIGINT) // 86400 AS day
           |  FROM lineitem),
           |z AS (
           |  SELECT bucket, min(day) AS zmin, max(day) AS zmax,
           |         CAST(count(*) AS BIGINT) AS nrows,
           |         CAST(sum(CASE WHEN day >= $loD AND day < $hiD
           |                  THEN 1 ELSE 0 END) AS BIGINT) AS matched
           |  FROM dd GROUP BY 1),
           |a AS (
           |  SELECT CAST(count(*) AS BIGINT) AS n_zones,
           |         CAST(sum(CASE WHEN zmax < $loD OR zmin >= $hiD
           |                  THEN 1 ELSE 0 END) AS BIGINT) AS n_skipped,
           |         CAST(sum(nrows) AS BIGINT) AS n_rows,
           |         CAST(sum(CASE WHEN zmax < $loD OR zmin >= $hiD
           |                  THEN 0 ELSE nrows END) AS BIGINT) AS rows_scanned,
           |         CAST(sum(matched) AS BIGINT) AS rows_matched
           |  FROM z)
           |SELECT n_zones, n_skipped,
           |       floor(CAST(n_skipped AS DOUBLE) / CAST(n_zones AS DOUBLE)
           |             * 1000000.0 + 0.5) / 1000000.0 AS skip_frac,
           |       n_rows, rows_scanned, rows_matched,
           |       floor(CAST(rows_scanned AS DOUBLE) / CAST(n_rows AS DOUBLE)
           |             * 1000000.0 + 0.5) / 1000000.0 AS scan_frac
           |FROM a""".stripMargin
      },
      doc = "zone-map (min/max footer) skip census for a summer-quarter " +
        "shipdate predicate over 8192-order write buckets: one " +
        "combinable zone reduction (shuffle moves one row per zone), " +
        "exact epoch-day integers, skip + forced-scan fractions — the " +
        "'is this table date-clustered enough' physical-design read"),

    Q("p10_hll_calibration",
      (s, d) => Profiling.hllCalibration(Tables.events(s, d)),
      Some("""WITH vals0 AS (
             |  SELECT 'event_type' AS g, CAST(event_type AS VARCHAR) AS v FROM events
             |  UNION ALL
             |  SELECT 'props', CAST(props AS VARCHAR) FROM events
             |  UNION ALL
             |  SELECT 'user_id', CAST(user_id AS VARCHAR) FROM events
             |  UNION ALL
             |  SELECT 'value_cents',
             |         CAST(CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS VARCHAR)
             |  FROM events),
             |vals AS (SELECT DISTINCT g, v FROM vals0 WHERE v IS NOT NULL),
             |h AS (SELECT g, ('0x' || substr(md5(v), 1, 14))::BIGINT AS h FROM vals),
             |reg AS (SELECT g, h % 64 AS j, h // 64 AS r FROM h),
             |rho AS (SELECT g, j, 1 + len(list_filter(range(1, 51), k -> r % (1::BIGINT << k) = 0)) AS rho FROM reg),
             |m AS (SELECT g, j, max(rho) AS m FROM rho GROUP BY g, j),
             |sk AS (SELECT g, CAST(sum(1::BIGINT << CAST(51 - m AS INT)) AS BIGINT) AS s_present,
             |              count(*) AS nz FROM m GROUP BY g),
             |e AS (SELECT g, CAST(count(*) AS BIGINT) AS exact_distinct FROM vals GROUP BY g),
             |est AS (
             |  SELECT g, nz, 0.709 * 4096.0 * CAST((1::BIGINT << 51) AS DOUBLE)
             |             / CAST(s_present + (64 - nz) * (1::BIGINT << 51) AS DOUBLE) AS raw
             |  FROM sk),
             |est2 AS (
             |  SELECT g, CAST(nz AS BIGINT) AS nonzero_registers,
             |         floor((CASE WHEN nz < 64 AND raw <= 160.0
             |                 THEN 64.0 * ln(64.0 / CAST(64 - nz AS DOUBLE))
             |                 ELSE raw END)
             |               * 10000.0 + 0.5) / 10000.0 AS hll_estimate
             |  FROM est)
             |SELECT e.g AS column_name, exact_distinct, nonzero_registers,
             |       hll_estimate,
             |       floor((hll_estimate - CAST(exact_distinct AS DOUBLE))
             |             / CAST(exact_distinct AS DOUBLE)
             |             * 1000000.0 + 0.5) / 1000000.0 AS rel_err
             |FROM e JOIN est2 ON e.g = est2.g
             |ORDER BY column_name""".stripMargin),
      doc = "sketch-calibration census: per column, exact distinct vs " +
        "the 64-register HLL estimate and its relative error — the " +
        "measured evidence behind p6's exact-to-approx swap note; one " +
        "stack unpivot pass into the shared x4/x10 register kernel, " +
        "doubles unpivot through exact cents (float formatting is not " +
        "engine-portable)"),

    Q("p11_pk_census",
      (s, d) => Profiling.pkCensus(s, d),
      Some("""SELECT table_name, n_rows, n_distinct,
             |       CAST(n_rows - n_distinct AS BIGINT) AS n_dup_keys
             |FROM (
             |  SELECT 'customer' AS table_name, CAST(count(*) AS BIGINT) AS n_rows,
             |         CAST(count(DISTINCT c_custkey) AS BIGINT) AS n_distinct FROM customer
             |  UNION ALL SELECT 'supplier', CAST(count(*) AS BIGINT),
             |         CAST(count(DISTINCT s_suppkey) AS BIGINT) FROM supplier
             |  UNION ALL SELECT 'part', CAST(count(*) AS BIGINT),
             |         CAST(count(DISTINCT p_partkey) AS BIGINT) FROM part
             |  UNION ALL SELECT 'orders', CAST(count(*) AS BIGINT),
             |         CAST(count(DISTINCT o_orderkey) AS BIGINT) FROM orders
             |  UNION ALL SELECT 'events', CAST(count(*) AS BIGINT),
             |         CAST(count(DISTINCT event_id) AS BIGINT) FROM events
             |  UNION ALL SELECT 'documents', CAST(count(*) AS BIGINT),
             |         CAST(count(DISTINCT doc_id) AS BIGINT) FROM documents
             |  UNION ALL SELECT 'embeddings', CAST(count(*) AS BIGINT),
             |         CAST(count(DISTINCT vec_id) AS BIGINT) FROM embeddings)
             |ORDER BY table_name""".stripMargin),
      doc = "primary-key uniqueness census across the schema (p7's " +
        "fan-out counterpart — dup keys multiply join rows): one " +
        "combinable (count, distinct) aggregate per table, |tables| " +
        "rows; approx_count_distinct is the 100 TB screen"),

    Q("p12_id_continuity",
      (s, d) => Profiling.idContinuity(s, d),
      Some("""SELECT table_name, n_rows, min_id, max_id,
             |       CAST(max_id - min_id + 1 - n_rows AS BIGINT) AS n_holes
             |FROM (
             |  SELECT 'customer' AS table_name, CAST(count(*) AS BIGINT) AS n_rows,
             |         CAST(min(c_custkey) AS BIGINT) AS min_id,
             |         CAST(max(c_custkey) AS BIGINT) AS max_id FROM customer
             |  UNION ALL SELECT 'part', CAST(count(*) AS BIGINT),
             |         CAST(min(p_partkey) AS BIGINT), CAST(max(p_partkey) AS BIGINT) FROM part
             |  UNION ALL SELECT 'orders', CAST(count(*) AS BIGINT),
             |         CAST(min(o_orderkey) AS BIGINT), CAST(max(o_orderkey) AS BIGINT) FROM orders
             |  UNION ALL SELECT 'events', CAST(count(*) AS BIGINT),
             |         CAST(min(event_id) AS BIGINT), CAST(max(event_id) AS BIGINT) FROM events
             |  UNION ALL SELECT 'documents', CAST(count(*) AS BIGINT),
             |         CAST(min(doc_id) AS BIGINT), CAST(max(doc_id) AS BIGINT) FROM documents
             |  UNION ALL SELECT 'embeddings', CAST(count(*) AS BIGINT),
             |         CAST(min(vec_id) AS BIGINT), CAST(max(vec_id) AS BIGINT) FROM embeddings)
             |ORDER BY table_name""".stripMargin),
      doc = "surrogate-id continuity census (dropped-ingest-partition " +
        "detector p7/p11 can't see): span vs count per dense-keyed " +
        "table — pure min/max/count aggregates, no sort, no window"),
  )
}
