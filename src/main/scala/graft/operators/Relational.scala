package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.{Q, Tables}
import graft.functions.Parity
import graft.functions.Parity.{exactAvg, pround}

/** Relational / metrics-rollup operators (SURVEY.md §2.D2 R1-R7) plus the
  * general relational surface (filter/join/agg/top-k) the analytics layer
  * rests on.
  *
  * The reference's missing `analyze_all_metrices.py` is reconstructed from
  * its committed CSV outputs (Analysis_Results dir): counter extraction → unit
  * conversion → derived rates → pivot → best-parameter argmin with
  * comma-joined ties (`result_map.csv:4` shows the "0.5,0.8" tie format).
  *
  * Scale notes: dimension joins (nation/region, per-group limits) are
  * explicit `broadcast()`; pivots use an explicit value list so the plan
  * is a single hash aggregate (no distinct-scan of the pivot column);
  * top-k compiles to TakeOrderedAndProject (no global sort); all money
  * sums are decimal (exact, and still map-side partially aggregated).
  */
object Relational {

  /** R1: counter-block line extraction — `\t\tName=value` → (counter,
    * value) rows (reference counters block `job_output.log:70-131`). */
  def parseCounterLine(lines: DataFrame): DataFrame = {
    val pat = "\\t\\t([\\w ]+)=(\\d+)"
    lines.select(
      col("event_id"),
      regexp_extract(col("line"), pat, 1).as("counter"),
      regexp_extract(col("line"), pat, 2).cast("long").as("cvalue"))
  }

  /** R7: result CSV sinks — long-form result_raw.csv and the wide pivot
    * CSVs (`Analysis_Results/` shape): header row, single file for
    * golden-diff parity (coalesce(1) is fine for these tiny rollups —
    * never for data-scale outputs). */
  def writeResultCsv(df: DataFrame, path: String): Unit =
    df.coalesce(1).write.mode("overwrite")
      .option("header", "true").csv(path)

  /** R6: argmin-with-ties — per group, the parameter values reaching the
    * best metric, ascending comma-joined (result_map.csv:4 tie format). */
  def bestParamTies(df: DataFrame, group: String, param: String,
      metric: String, asc: Boolean): DataFrame = {
    val ord = if (asc) col(metric).asc else col(metric).desc
    val w = Window.partitionBy(group).orderBy(ord)
    df.withColumn("rk", rank().over(w))
      .where(col("rk") === 1)
      .groupBy(group)
      .agg(concat_ws(",", sort_array(collect_list(col(param))))
        .as("best_param"))
  }

  // q37 growth tree, shared verbatim with the oracle: no prior month (or
  // a zero prior) -> null, not ANSI divide-by-zero.
  private[operators] val monthGrowthExpr =
    "(case when prev_cents is null or prev_cents = 0 then cast(null as double) " +
      "else (cast(rev_cents as double) - cast(prev_cents as double)) / " +
      "cast(prev_cents as double) end)"

  // Grouped-OLS slope tree over exact integer moments, shared verbatim
  // with the oracle; a constant-discount segment has no slope -> null.
  private[operators] val groupSlopeExpr =
    "(case when n * sxx - sx * sx = 0 then cast(null as double) " +
      "else cast(n * sxy - sx * sy as double) " +
      "/ cast(n * sxx - sx * sx as double) end)"

  /** Distinct items per order under the deterministic 64-item basket
    * cap — the ONE kernel q44 (support ranking) and q45 (lift ranking)
    * both expand, so the two basket views cannot drift. The cap bounds
    * the quadratic pair fan-out real carts would otherwise produce
    * (worst basket = 2016 pairs); the kept subset is id-ordered, so it
    * is deterministic and mirrored in both oracles. */
  private[operators] def cappedBasketItems(lineitem: DataFrame,
      cap: Int = 64): DataFrame = {
    val items = lineitem.select(col("l_orderkey"), col("l_partkey")).distinct()
    val capW = Window.partitionBy("l_orderkey").orderBy("l_partkey")
    items.withColumn("rn", row_number().over(capW))
      .where(col("rn") <= cap).drop("rn")
  }

  /** Session-shared BUCKETED capped-basket layout (r19): q44/q45/q47
    * each rebuilt the identical kernel — a lineitem distinct + per-order
    * cap window — once per query (q45/q47 additionally storing their
    * own copy). One bucketed+sorted-by-l_orderkey write per (session,
    * dir) now serves all three, and because every consumer's next step
    * keys on l_orderkey (the q44/q45 pair self-joins, q47's order-
    * sequence attach), the basket side of those joins needs NO exchange
    * — the q50/g15 write-time-shuffle lever applied to the basket
    * kernel. Content identical to [[cappedBasketItems]] by
    * construction; hygiene (stopped-session eviction, temp-dir
    * tracking) rides the shared [[graft.sources.Bucketing]] machinery. */
  private[operators] def sharedCappedBasket(
      s: org.apache.spark.sql.SparkSession, d: String): DataFrame =
    graft.sources.Bucketing.sharedBucketedTable(s, d, "basket",
      "l_orderkey", () => cappedBasketItems(Tables.lineitem(s, d)))
}

object RelationalQueries {
  import Relational._

  val qs: Seq[Q] = Seq(
    Q("r1_counter_parse",
      (s, d) => parseCounterLine(
        Tables.events(s, d).select(col("event_id"),
          concat(lit("\t\t"), col("event_type"), lit(" records="),
            col("event_id") * 7 + 1).as("line")))
        .orderBy("event_id"),
      Some("""WITH lines AS (
             |  SELECT event_id,
             |         chr(9) || chr(9) || event_type || ' records=' ||
             |         (event_id * 7 + 1) AS line
             |  FROM events)
             |SELECT event_id,
             |       regexp_extract(line, '\t\t([\w ]+)=(\d+)', 1) AS counter,
             |       CAST(regexp_extract(line, '\t\t([\w ]+)=(\d+)', 2) AS BIGINT) AS cvalue
             |FROM lines ORDER BY event_id""".stripMargin),
      doc = "R1 counter-line extraction (job_output.log:70-131)"),

    Q("r2_unit_conv",
      (s, d) => Tables.lineitem(s, d).select(
        col("l_orderkey"), col("l_linenumber"),
        floor(col("l_extendedprice") * 1000).cast("long").as("bytes"))
        .select(col("l_orderkey"), col("l_linenumber"),
          pround(col("bytes") / 1048576.0, 2).as("mb"))
        .orderBy("l_orderkey", "l_linenumber"),
      Some("""SELECT l_orderkey, l_linenumber,
             |       floor(CAST(floor(l_extendedprice * 1000) AS BIGINT) / 1048576.0 * 100.0 + 0.5) / 100.0 AS mb
             |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin),
      doc = "R2 unit conversion bytes→MB ÷2^20, 2-dp (README.md:324-328)"),

    Q("r3_derived_rate",
      (s, d) => Tables.lineitem(s, d)
        .where(col("l_quantity") > 0)
        .select(col("l_orderkey"), col("l_linenumber"),
          pround(
            (floor(col("l_extendedprice") * 1000).cast("long") / 1048576.0) /
              col("l_quantity"), 2).as("mb_per_s"))
        .orderBy("l_orderkey", "l_linenumber"),
      Some("""SELECT l_orderkey, l_linenumber,
             |       floor((CAST(floor(l_extendedprice * 1000) AS BIGINT) / 1048576.0)
             |             / l_quantity * 100.0 + 0.5) / 100.0 AS mb_per_s
             |FROM lineitem WHERE l_quantity > 0
             |ORDER BY l_orderkey, l_linenumber""".stripMargin),
      doc = "R3 derived rate: MB per unit time (README.md:331-337)"),

    Q("r4_avg_cpu",
      (s, d) => Tables.events(s, d).groupBy("user_id")
        .agg(pround(exactAvg(col("value")), 2).as("avg_cpu"))
        .orderBy("user_id"),
      Some("""SELECT user_id,
             |       floor(CAST(sum(CAST(floor(value * 1000000.0 + 0.5) / 1000000.0 AS DECIMAL(28,6))) AS DOUBLE)
             |             / count(*) * 100.0 + 0.5) / 100.0 AS avg_cpu
             |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin),
      doc = "R4 per-run average CPU (result_raw.csv Avg_CPU)"),

    Q("r5_pivot",
      (s, d) => {
        val types = Seq("click", "error", "purchase", "signup", "view")
        val p = Tables.events(s, d)
          .select((col("user_id") % 10).as("bucket"), col("event_type"))
          .groupBy("bucket").pivot("event_type", types).count()
        types.foldLeft(p)((df, t) =>
          df.withColumn(t, coalesce(col(t), lit(0L))))
          .orderBy("bucket")
      },
      Some("""SELECT user_id % 10 AS bucket,
             |       count(*) FILTER (WHERE event_type = 'click') AS click,
             |       count(*) FILTER (WHERE event_type = 'error') AS error,
             |       count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
             |       count(*) FILTER (WHERE event_type = 'signup') AS signup,
             |       count(*) FILTER (WHERE event_type = 'view') AS view
             |FROM events GROUP BY bucket ORDER BY bucket""".stripMargin),
      doc = "R5 long→wide pivot with explicit value list (result_time.csv shape)"),

    Q("r6_best_ties",
      (s, d) => bestParamTies(
        Tables.events(s, d)
          .groupBy(col("event_type"), lpad(hour(col("ts")).cast("string"), 2, "0").as("hh"))
          .agg(count(lit(1)).as("cnt")),
        "event_type", "hh", "cnt", asc = false)
        .orderBy("event_type"),
      Some("""WITH cnts AS (
             |  SELECT event_type, lpad(CAST(hour(ts) AS VARCHAR), 2, '0') AS hh,
             |         count(*) AS cnt
             |  FROM events GROUP BY event_type, hh),
             |rk AS (
             |  SELECT event_type, hh,
             |         rank() OVER (PARTITION BY event_type ORDER BY cnt DESC) AS rk
             |  FROM cnts)
             |SELECT event_type,
             |       array_to_string(list_sort(list(hh)), ',') AS best_param
             |FROM rk WHERE rk = 1 GROUP BY event_type
             |ORDER BY event_type""".stripMargin),
      doc = "R6 best-parameter argmax with ascending comma-joined ties (result_map.csv:4)"),

    Q("q1_pricing_summary",
      (s, d) => Tables.lineitem(s, d)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum(col("l_quantity").cast(DecimalType(18, 2))).cast("double").as("sum_qty"),
          sum(col("l_extendedprice").cast(DecimalType(18, 2))).cast("double").as("sum_base"),
          sum(pround(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4)
            .cast(DecimalType(28, 4))).cast("double").as("sum_disc_price"),
          pround(exactAvg(col("l_quantity")), 4).as("avg_qty"),
          pround(exactAvg(col("l_discount")), 4).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus"),
      Some("""SELECT l_returnflag, l_linestatus,
             |       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
             |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base,
             |       CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * 10000.0 + 0.5) / 10000.0 AS DECIMAL(28,4))) AS DOUBLE) AS sum_disc_price,
             |       floor(CAST(sum(CAST(floor(l_quantity * 1000000.0 + 0.5) / 1000000.0 AS DECIMAL(28,6))) AS DOUBLE) / count(*) * 10000.0 + 0.5) / 10000.0 AS avg_qty,
             |       floor(CAST(sum(CAST(floor(l_discount * 1000000.0 + 0.5) / 1000000.0 AS DECIMAL(28,6))) AS DOUBLE) / count(*) * 10000.0 + 0.5) / 10000.0 AS avg_disc,
             |       count(*) AS count_order
             |FROM lineitem GROUP BY l_returnflag, l_linestatus
             |ORDER BY l_returnflag, l_linestatus""".stripMargin),
      doc = "TPC-H Q1-style pricing summary; decimal-exact money sums"),

    Q("q2_region_rollup",
      (s, d) => Tables.customer(s, d)
        .join(broadcast(Tables.nation(s, d)),
          col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, d)),
          col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name")
        .agg(count(lit(1)).as("n_cust"),
          sum(col("c_acctbal").cast(DecimalType(18, 2))).cast("double").as("sum_acctbal"))
        .orderBy("r_name"),
      Some("""SELECT r_name, count(*) AS n_cust,
             |       CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_acctbal
             |FROM customer
             |JOIN nation ON c_nationkey = n_nationkey
             |JOIN region ON n_regionkey = r_regionkey
             |GROUP BY r_name ORDER BY r_name""".stripMargin),
      doc = "star-schema rollup; both dims broadcast (no shuffle of customer)"),

    Q("q3_topk_orders",
      (s, d) => Tables.orders(s, d)
        .select("o_orderkey", "o_totalprice")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(10),
      Some("""SELECT o_orderkey, o_totalprice FROM orders
             |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin),
      doc = "top-k via TakeOrderedAndProject (no global sort)"),

    Q("q14_small_qty_revenue",
      (s, d) => {
        // TPC-H Q17 shape: the correlated per-part average decorrelates
        // into an aggregate of the same table joined back on the key —
        // at scale both sides shuffle once on l_partkey (co-partitioned)
        val li = Tables.lineitem(s, d)
        val avgQ = li.groupBy("l_partkey").agg(exactAvg(col("l_quantity")).as("avg_qty"))
        li.join(avgQ, "l_partkey")
          .where(col("l_quantity") < col("avg_qty") * 0.2)
          .agg(
            sum(pround(col("l_extendedprice"), 4).cast(DecimalType(28, 4)))
              .cast("double").as("revenue"),
            count(lit(1)).as("n_rows"))
      },
      Some("""WITH a AS (
             |  SELECT l_partkey,
             |         CAST(sum(CAST(floor(l_quantity * 1000000.0 + 0.5) / 1000000.0 AS DECIMAL(28,6))) AS DOUBLE) / count(*) AS avg_qty
             |  FROM lineitem GROUP BY l_partkey)
             |SELECT CAST(sum(CAST(floor(l_extendedprice * 10000.0 + 0.5) / 10000.0 AS DECIMAL(28,4))) AS DOUBLE) AS revenue,
             |       count(*) AS n_rows
             |FROM lineitem JOIN a USING (l_partkey)
             |WHERE l_quantity < avg_qty * 0.2""".stripMargin),
      doc = "TPC-H Q17-style correlated aggregate: rows below 20% of their " +
        "part's average quantity (decorrelated self-agg join)"),

    Q("q15_top_supplier",
      (s, d) => {
        // revenue as fixed-point LONG cents-of-cents: floor(x·10^4+0.5)
        // summed as int64, divided once — integer adds in the hash
        // aggregate instead of per-row BigDecimal (DecimalType(28,4)
        // exceeds Spark's 18-digit compact-long range, so its partial
        // aggregation allocates). Identical bits to the decimal sum:
        // both are the exact integer sum of the same quantized values;
        // long→double then /10^4 and decimal→double are both
        // correctly-rounded single conversions. Safe per GROUP: a
        // supplier has O(600) lineitems at any TPC-H SF (both tables
        // scale linearly), so the per-group sum (~6e11 fixed-point
        // units) stays below 2^53 — the bound that matters for the
        // bit-identity claim, since long→double is exact only up to
        // 2^53 (between 2^53 and 2^63 the conversion rounds and could
        // diverge from the decimal path, long before int64 overflow
        // at 2^63 is in sight). Corpus-
        // GLOBAL money sums (q1/q4/q14) keep DECIMAL(28,4): at 10^11+
        // rows × ~10^9 fixed-point units they would overflow int64.
        val rev = Tables.lineitem(s, d)
          .groupBy("l_suppkey")
          .agg((sum(floor(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
              * 10000.0 + 0.5))
            .cast("double") / 10000.0).as("total_rev"))
        // ties kept WITHOUT a global rank window: Window.orderBy with no
        // partitionBy plans a single-task sort of the whole per-supplier
        // aggregate (fine at sf0.1, a one-reducer wall at 10^7+ suppliers).
        // max() reduces map-side to one row; broadcast + equality filter
        // keeps exactly the rank-1 ties. Runtime exchange reuse computes
        // the rev subtree once for both consumers.
        val best = rev.agg(max(col("total_rev")).as("max_rev"))
        rev.join(broadcast(best), col("total_rev") === col("max_rev"))
          .join(Tables.supplier(s, d),
            col("l_suppkey") === col("s_suppkey"))
          .select(col("s_suppkey"), col("s_name"), col("total_rev"))
          .orderBy("s_suppkey")
      },
      Some("""WITH rev AS (
             |  SELECT l_suppkey,
             |         CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * 10000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 10000.0 AS total_rev
             |  FROM lineitem GROUP BY l_suppkey)
             |SELECT s_suppkey, s_name, total_rev
             |FROM rev JOIN supplier ON l_suppkey = s_suppkey
             |WHERE total_rev = (SELECT max(total_rev) FROM rev)
             |ORDER BY s_suppkey""".stripMargin),
      doc = "TPC-H Q15-style top supplier with ALL ties kept (max aggregate " +
        "broadcast back — no global rank window; exact fixed-point revenue " +
        "makes ties stable)"),

    Q("q5_order_revenue",
      (s, d) => {
        // per-order revenue in fixed-point LONG units (see q15's note:
        // integer adds beat >18-digit decimal's BigDecimal partial agg;
        // an order has ≤7 lineitems so the group sum can never overflow)
        val rev = Tables.lineitem(s, d)
          .groupBy("l_orderkey")
          .agg((sum(floor(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
              * 10000.0 + 0.5))
            .cast("double") / 10000.0).as("revenue"))
        // large-large equi-join: shuffle (sort-merge at scale) on the
        // order key, then top-k — no global sort materialization
        Tables.orders(s, d)
          .where(col("o_orderstatus") === "O")
          .select("o_orderkey", "o_orderdate")
          .join(rev, col("o_orderkey") === col("l_orderkey"))
          .orderBy(col("revenue").desc, col("o_orderkey"))
          .limit(10)
          .select(col("o_orderkey"), col("o_orderdate"), col("revenue"))
      },
      Some("""WITH rev AS (
             |  SELECT l_orderkey,
             |         CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * 10000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 10000.0 AS revenue
             |  FROM lineitem GROUP BY l_orderkey)
             |SELECT o_orderkey, o_orderdate, revenue
             |FROM orders JOIN rev ON o_orderkey = l_orderkey
             |WHERE o_orderstatus = 'O'
             |ORDER BY revenue DESC, o_orderkey LIMIT 10""".stripMargin),
      doc = "TPC-H Q3-style large-large shuffle join + top-k"),

    Q("q6_cust_no_orders",
      (s, d) => Tables.customer(s, d)
        .join(Tables.orders(s, d).select("o_custkey"),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy("c_mktsegment").agg(count(lit(1)).as("n_inactive"))
        .orderBy("c_mktsegment"),
      Some("""SELECT c_mktsegment, count(*) AS n_inactive
             |FROM customer
             |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
             |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin),
      doc = "anti-join: customers with no orders, per segment"),

    Q("q7_priority_semi",
      (s, d) => Tables.orders(s, d)
        .join(Tables.lineitem(s, d)
          .where(col("l_quantity") >= 45).select("l_orderkey"),
          col("o_orderkey") === col("l_orderkey"), "left_semi")
        .groupBy("o_orderpriority").agg(count(lit(1)).as("n_orders"))
        .orderBy("o_orderpriority"),
      Some("""SELECT o_orderpriority, count(*) AS n_orders
             |FROM orders
             |WHERE EXISTS (SELECT 1 FROM lineitem
             |              WHERE l_orderkey = o_orderkey AND l_quantity >= 45)
             |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin),
      doc = "semi-join (TPC-H Q4 flavor): orders with any heavy lineitem"),

    Q("q8_union_distinct",
      (s, d) => Tables.customer(s, d).select(col("c_nationkey").as("nationkey"))
        .union(Tables.supplier(s, d).select(col("s_nationkey").as("nationkey")))
        .distinct()
        .orderBy("nationkey"),
      Some("""SELECT c_nationkey AS nationkey FROM customer
             |UNION SELECT s_nationkey FROM supplier
             |ORDER BY nationkey""".stripMargin),
      doc = "union + distinct over two sources"),

    Q("q9_part_strings",
      (s, d) => Tables.part(s, d)
        .where(col("p_type").startsWith("STANDARD") ||
          col("p_name").contains("green"))
        .select(col("p_partkey"),
          upper(col("p_brand")).as("brand_uc"),
          substring(col("p_type"), 1, 8).as("type_prefix"),
          length(col("p_name")).as("name_len"))
        .orderBy("p_partkey"),
      Some("""SELECT p_partkey, upper(p_brand) AS brand_uc,
             |       substr(p_type, 1, 8) AS type_prefix,
             |       length(p_name) AS name_len
             |FROM part
             |WHERE p_type LIKE 'STANDARD%' OR contains(p_name, 'green')
             |ORDER BY p_partkey""".stripMargin),
      doc = "string-function surface over part (prefix/contains filters pushed)"),

    Q("q12_full_outer",
      (s, d) => {
        val a = Tables.customer(s, d).where(col("c_acctbal") > 9000)
          .groupBy(col("c_nationkey").as("nk_a"))
          .agg(count(lit(1)).as("n_cust"))
        val b = Tables.supplier(s, d).where(col("s_acctbal") > 9000)
          .groupBy(col("s_nationkey").as("nk_b"))
          .agg(count(lit(1)).as("n_supp"))
        a.join(b, col("nk_a") === col("nk_b"), "full_outer")
          .select(coalesce(col("nk_a"), col("nk_b")).as("nationkey"),
            coalesce(col("n_cust"), lit(0L)).as("n_cust"),
            coalesce(col("n_supp"), lit(0L)).as("n_supp"))
          .orderBy("nationkey")
      },
      Some("""WITH a AS (
             |  SELECT c_nationkey AS nk_a, count(*) AS n_cust
             |  FROM customer WHERE c_acctbal > 9000 GROUP BY c_nationkey),
             |b AS (
             |  SELECT s_nationkey AS nk_b, count(*) AS n_supp
             |  FROM supplier WHERE s_acctbal > 9000 GROUP BY s_nationkey)
             |SELECT coalesce(nk_a, nk_b) AS nationkey,
             |       coalesce(n_cust, 0) AS n_cust,
             |       coalesce(n_supp, 0) AS n_supp
             |FROM a FULL JOIN b ON nk_a = nk_b
             |ORDER BY nationkey""".stripMargin),
      doc = "full outer join of filtered per-nation aggregates (both null " +
        "sides exercised; completes the join-type surface)"),

    Q("q13_sliding_window",
      (s, d) => {
        // unix_timestamp on an NTZ column reads the session zone — pinned
        // to UTC for every forked run by build.sbt (same contract a2b and
        // r8 rely on), matching the oracle's epoch(ts)
        val w = Window.partitionBy("user_id")
          .orderBy(unix_timestamp(col("ts")))
          .rangeBetween(-3600L, 0L)
        Tables.events(s, d)
          .select(col("event_id"), col("user_id"),
            count(lit(1)).over(w).as("n_last_hour"))
          .orderBy("event_id")
      },
      Some("""SELECT event_id, user_id,
             |       count(*) OVER (PARTITION BY user_id
             |                      ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
             |                      RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW) AS n_last_hour
             |FROM events ORDER BY event_id""".stripMargin),
      doc = "time-RANGE window frame: trailing-hour event count per user " +
        "(value-based frame with peer grouping, not a ROWS frame)"),

    Q("q11_rollup",
      (s, d) => Tables.lineitem(s, d)
        .rollup("l_returnflag", "l_linestatus")
        .agg(grouping(col("l_returnflag")).cast("long").as("g1"),
          grouping(col("l_linestatus")).cast("long").as("g2"),
          count(lit(1)).as("n"),
          pround(sum(pround(col("l_quantity"), 6).cast(DecimalType(28, 6)))
            .cast("double"), 2).as("sum_qty"))
        .orderBy("g1", "g2", "l_returnflag", "l_linestatus"),
      Some("""SELECT l_returnflag, l_linestatus,
             |       GROUPING(l_returnflag) AS g1, GROUPING(l_linestatus) AS g2,
             |       count(*) AS n,
             |       floor(CAST(sum(CAST(floor(l_quantity * 1000000.0 + 0.5) / 1000000.0
             |                          AS DECIMAL(28,6))) AS DOUBLE) * 100.0 + 0.5) / 100.0 AS sum_qty
             |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
             |ORDER BY g1, g2, l_returnflag, l_linestatus""".stripMargin),
      doc = "grouping-sets rollup: per-(flag,status), per-flag, and grand " +
        "totals in one Expand pass (OLAP subtotal surface)"),

    Q("q10_cumulative_revenue",
      (s, d) => {
        val daily = Tables.orders(s, d)
          .groupBy(col("o_orderpriority"),
            date_trunc("month", col("o_orderdate")).as("month"))
          .agg(sum(col("o_totalprice").cast(DecimalType(18, 2)))
            .cast("double").as("month_rev"))
        val w = Window.partitionBy("o_orderpriority").orderBy("month")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        daily.select(col("o_orderpriority"), col("month"),
          pround(sum(pround(col("month_rev"), 2).cast(DecimalType(28, 2)))
            .over(w).cast("double"), 2).as("cum_rev"))
          .orderBy("o_orderpriority", "month")
      },
      Some("""WITH daily AS (
             |  SELECT o_orderpriority, date_trunc('month', o_orderdate) AS month,
             |         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS month_rev
             |  FROM orders GROUP BY o_orderpriority, month)
             |SELECT o_orderpriority, month,
             |       floor(CAST(sum(CAST(floor(month_rev * 100.0 + 0.5) / 100.0 AS DECIMAL(28,2)))
             |               OVER (PARTITION BY o_orderpriority ORDER BY month
             |                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
             |             * 100.0 + 0.5) / 100.0 AS cum_rev
             |FROM daily ORDER BY o_orderpriority, month""".stripMargin),
      doc = "cumulative time-series window: monthly revenue running sum per priority"),

    Q("q4_revenue_filter",
      (s, d) => Tables.lineitem(s, d)
        .where(col("l_shipdate") >= lit("1996-01-01").cast("timestamp_ntz") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp_ntz") &&
          col("l_discount") >= 0.03 && col("l_quantity") < 24)
        .agg(sum(pround(col("l_extendedprice") * col("l_discount"), 4)
          .cast(DecimalType(28, 4))).cast("double").as("revenue"),
          count(lit(1)).as("n_rows")),
      Some("""SELECT CAST(sum(CAST(floor(l_extendedprice * l_discount * 10000.0 + 0.5) / 10000.0 AS DECIMAL(28,4))) AS DOUBLE) AS revenue,
             |       count(*) AS n_rows
             |FROM lineitem
             |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
             |  AND l_shipdate < TIMESTAMP '1997-01-01'
             |  AND l_discount >= 0.03 AND l_quantity < 24""".stripMargin),
      doc = "TPC-H Q6-style selective scan — date+range predicates push to parquet"),

    Q("q16_cube",
      (s, d) => Tables.orders(s, d)
        .cube("o_orderstatus", "o_orderpriority")
        .agg(grouping(col("o_orderstatus")).cast("long").as("g1"),
          grouping(col("o_orderpriority")).cast("long").as("g2"),
          count(lit(1)).as("n"),
          pround(sum(pround(col("o_totalprice"), 2).cast(DecimalType(28, 2)))
            .cast("double"), 2).as("sum_price"))
        .orderBy("g1", "g2", "o_orderstatus", "o_orderpriority"),
      Some("""SELECT o_orderstatus, o_orderpriority,
             |       GROUPING(o_orderstatus) AS g1, GROUPING(o_orderpriority) AS g2,
             |       count(*) AS n,
             |       floor(CAST(sum(CAST(floor(o_totalprice * 100.0 + 0.5) / 100.0
             |                          AS DECIMAL(28,2))) AS DOUBLE) * 100.0 + 0.5) / 100.0 AS sum_price
             |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
             |ORDER BY g1, g2, o_orderstatus, o_orderpriority""".stripMargin),
      doc = "CUBE grouping sets: all four (status, priority) subtotal " +
        "combinations in one Expand pass — completes the rollup surface " +
        "(q11) to full OLAP cube semantics"),

    Q("q17_ntile",
      (s, d) => {
        // quartiles WITHIN each priority: the window parallelizes per
        // group (global exact ntile would be a one-reducer sort; the
        // approximate global path at 100 TB is the p4 quantile sketch)
        val w = Window.partitionBy("o_orderpriority")
          .orderBy(col("o_totalprice"), col("o_orderkey"))
        Tables.orders(s, d)
          .select(col("o_orderpriority"), col("o_totalprice"), col("o_orderkey"))
          .withColumn("quartile", ntile(4).over(w).cast("long"))
          .groupBy("o_orderpriority", "quartile")
          .agg(count(lit(1)).as("n"),
            min(col("o_totalprice")).as("lo"),
            max(col("o_totalprice")).as("hi"),
            pround(exactAvg(col("o_totalprice")), 2).as("avg_price"))
          .orderBy("o_orderpriority", "quartile")
      },
      Some(s"""WITH t AS (
              |  SELECT o_orderpriority, o_totalprice,
              |         ntile(4) OVER (PARTITION BY o_orderpriority
              |                        ORDER BY o_totalprice, o_orderkey) AS quartile
              |  FROM orders)
              |SELECT o_orderpriority, CAST(quartile AS BIGINT) AS quartile,
              |       count(*) AS n, min(o_totalprice) AS lo, max(o_totalprice) AS hi,
              |       floor(${Parity.exactAvgSql("o_totalprice")} * 100.0 + 0.5) / 100.0 AS avg_price
              |FROM t GROUP BY o_orderpriority, quartile
              |ORDER BY o_orderpriority, quartile""".stripMargin),
      doc = "ntile quartile buckets per priority group: distribution " +
        "banding with a per-group (parallel) window, exact decimal averages"),

    Q("q18_blame_supplier",
      (s, d) => {
        // TPC-H Q21 shape on the available columns: suppliers who were
        // the ONLY late shipper (>60 days after order date) on a
        // multi-supplier order. Restructured in r13 (VERDICT item 2):
        // the r12 form decorrelated EXISTS/NOT EXISTS into semi/anti
        // joins, paying THREE full lineitem scans — the suite's
        // heaviest shuffle and the driver's repeat false-flag. Both
        // subqueries are really per-order COUNTS, so one scan suffices:
        // reduce lineitem⋈orders to per-(order, supplier) late flags,
        // then a second order-level aggregate gives n_supp / n_late /
        // the lone late supplier, and the blame set is
        // `n_supp > 1 ∧ n_late = 1` — EXISTS(other supplier) ⟺
        // n_supp ≥ 2, NOT EXISTS(other late) ⟺ n_late = 1. At scale
        // both aggregates reuse the join's l_orderkey hash partitioning
        // (HashPartitioning(ok) satisfies clustering on (ok, sk) and on
        // ok), so the whole reduction runs on TWO exchanges (lineitem +
        // orders) with no distinct, semi, anti join or window sort
        // anywhere. Equivalence does not even need referential
        // integrity: a blame candidate is late, so its order row
        // exists, so every co-supplier pair of that order survives the
        // inner join. Supplier names arrive broadcast after the
        // reduce, top-10 via TakeOrdered.
        val flags = Tables.lineitem(s, d)
          .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
          .join(Tables.orders(s, d).select("o_orderkey", "o_orderdate"),
            col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("l_orderkey"), col("l_suppkey"))
          .agg(max(when(
            col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"),
            1L).otherwise(0L)).as("is_late"))
        val blamed = flags
          .groupBy(col("l_orderkey"))
          .agg(count(lit(1)).as("n_supp"), sum(col("is_late")).as("n_late"),
            max(when(col("is_late") === 1L, col("l_suppkey"))).as("l_suppkey"))
          .where(col("n_supp") > 1L && col("n_late") === 1L)
        blamed
          .join(broadcast(Tables.supplier(s, d)
            .select(col("s_suppkey"), col("s_name"))),
            col("l_suppkey") === col("s_suppkey"))
          .groupBy("s_name").agg(count(lit(1)).as("numwait"))
          .orderBy(col("numwait").desc, col("s_name"))
          .limit(10)
      },
      Some(s"""WITH lp AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem),
              |late AS (
              |  SELECT DISTINCT l.l_orderkey, l.l_suppkey
              |  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
              |  WHERE l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY),
              |w AS (
              |  SELECT lt.l_orderkey, lt.l_suppkey FROM late lt
              |  WHERE EXISTS (SELECT 1 FROM lp
              |                WHERE lp.l_orderkey = lt.l_orderkey
              |                  AND lp.l_suppkey <> lt.l_suppkey)
              |    AND NOT EXISTS (SELECT 1 FROM late l3
              |                    WHERE l3.l_orderkey = lt.l_orderkey
              |                      AND l3.l_suppkey <> lt.l_suppkey))
              |SELECT s.s_name, count(*) AS numwait
              |FROM w JOIN supplier s ON s.s_suppkey = w.l_suppkey
              |GROUP BY s.s_name ORDER BY numwait DESC, s_name LIMIT 10""".stripMargin),
      doc = "TPC-H Q21-style lone-late-supplier blame: the EXISTS/NOT " +
        "EXISTS subqueries collapse to per-order supplier/late counts — " +
        "one lineitem scan, two stacked aggregates reusing the join's " +
        "l_orderkey partitioning at scale (two exchanges total), " +
        "supplier dimension broadcast after the reduce"),

    Q("q19_revenue_share",
      (s, d) => {
        // TPC-H Q11 shape: groups whose share of a GLOBAL total clears a
        // bar. The scalar total is the sum of the already-reduced
        // per-nation decimals (25 rows), broadcast back as one row — the
        // fact table is scanned and shuffled ONCE; the share filter and
        // division are projections. Decimal sums end-to-end, so the
        // share is a single double division of engine-identical values.
        val rev = Tables.lineitem(s, d)
          .join(Tables.orders(s, d).select("o_orderkey", "o_custkey"),
            col("l_orderkey") === col("o_orderkey"))
          .join(Tables.customer(s, d).select("c_custkey", "c_nationkey"),
            col("o_custkey") === col("c_custkey"))
          .join(broadcast(Tables.nation(s, d).select("n_nationkey", "n_name")),
            col("c_nationkey") === col("n_nationkey"))
          .groupBy("n_name")
          .agg(sum(pround(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4)
            .cast(DecimalType(28, 4))).as("rev"))
          // EAGER (r19): the |nations|-row reduced table feeds both the
          // scalar total and the share projection — without storage the
          // full lineitem⋈orders⋈customer join ran once per consumer
          // (exchange reuse does not span the broadcast boundary here).
          .transform(Materialize.frame)
        val tot = rev.agg(sum(col("rev")).as("tot"))
        rev.crossJoin(broadcast(tot))
          .select(col("n_name"), col("rev").cast("double").as("revenue"),
            pround(col("rev").cast("double") / col("tot").cast("double"), 6)
              .as("share"))
          .where(col("share") > 0.03)
          .orderBy("n_name")
      },
      Some("""WITH r AS (
             |  SELECT n_name,
             |         sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * 10000.0 + 0.5) / 10000.0 AS DECIMAL(28,4))) AS rev
             |  FROM lineitem
             |  JOIN orders ON o_orderkey = l_orderkey
             |  JOIN customer ON c_custkey = o_custkey
             |  JOIN nation ON n_nationkey = c_nationkey
             |  GROUP BY n_name),
             |t AS (SELECT sum(rev) AS tot FROM r)
             |SELECT n_name, CAST(rev AS DOUBLE) AS revenue,
             |       floor(CAST(rev AS DOUBLE) / CAST(tot AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0 AS share
             |FROM r, t
             |WHERE floor(CAST(rev AS DOUBLE) / CAST(tot AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0 > 0.03
             |ORDER BY n_name""".stripMargin),
      doc = "TPC-H Q11-style share-of-global with HAVING: one fact scan, " +
        "per-nation decimal sums, 1-row global total broadcast back, " +
        "share filter as a projection"),

    Q("q20_dominant_supplier",
      (s, d) => {
        // TPC-H Q20 shape: a nested correlated aggregate — keep the
        // (part, supplier) pairs shipping more than TWICE the part's
        // average per-supplier quantity (parts here have 13-41 suppliers
        // with near-uniform shares, so an absolute >50% bar never fires;
        // the 2x-fair-share bar keeps the identical decorrelated plan
        // non-degenerate at every SF). Decorrelated: ONE fact shuffle to
        // (partkey, suppkey), a second reduce of the already-key-reduced
        // pairs to per-part totals + supplier counts, joined back on
        // partkey; `ps*ns > 2*p` compares exact integer quantity-cents
        // (q15's integer-adds discipline — per-part sums stay far below
        // 2^53). The supplier dim broadcasts AFTER the reduce.
        // EAGER (r19): the (part, supplier) reduction is consumed by the
        // per-part rollup AND the join back — storing it runs the fact
        // scan + shuffle once instead of once per consumer; the stored
        // table is key-space-bounded (|part×supplier| pairs), the same
        // persisted-intermediate a warehouse keeps.
        val ps = Materialize.frame(Tables.lineitem(s, d)
          .groupBy("l_partkey", "l_suppkey")
          .agg(sum(floor(col("l_quantity") * 100.0 + 0.5)).as("ps_qty")))
        val p = ps.groupBy("l_partkey")
          .agg(sum(col("ps_qty")).as("p_qty"), count(lit(1)).as("ns"))
        ps.join(p, "l_partkey")
          .where(col("ps_qty") * col("ns") > col("p_qty") * 2)
          .join(broadcast(Tables.supplier(s, d).select("s_suppkey", "s_name")),
            col("l_suppkey") === col("s_suppkey"))
          .groupBy("s_suppkey", "s_name")
          .agg(count(lit(1)).as("n_dominant_parts"),
            (sum(col("ps_qty")).cast("double") / 100.0).as("dom_qty"))
          .orderBy("s_suppkey")
      },
      Some("""WITH ps AS (
             |  SELECT l_partkey, l_suppkey,
             |         CAST(sum(CAST(floor(l_quantity * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS ps_qty
             |  FROM lineitem GROUP BY l_partkey, l_suppkey),
             |p AS (SELECT l_partkey, CAST(sum(ps_qty) AS BIGINT) AS p_qty,
             |             count(*) AS ns
             |      FROM ps GROUP BY l_partkey)
             |SELECT s_suppkey, s_name, count(*) AS n_dominant_parts,
             |       CAST(CAST(sum(ps_qty) AS BIGINT) AS DOUBLE) / 100.0 AS dom_qty
             |FROM ps JOIN p USING (l_partkey)
             |JOIN supplier ON s_suppkey = l_suppkey
             |WHERE ps_qty * ns > p_qty * 2
             |GROUP BY s_suppkey, s_name ORDER BY s_suppkey""".stripMargin),
      doc = "TPC-H Q20-style nested correlated aggregate: suppliers " +
        "shipping over twice a part's average per-supplier quantity - " +
        "decorrelated to two key-reduced aggregations + a join back, " +
        "exact integer-cents comparison"),

    Q("q22_idle_rich",
      (s, d) => {
        // TPC-H Q22 shape: customers above the positive-balance average
        // with NO urgent orders (every customer here has SOME order, so
        // the textbook no-orders-at-all bar is empty at every SF; the
        // filtered anti-join side keeps the identical plan — filter
        // pushed below the left-anti — non-degenerate). The scalar bar
        // is a 1-row broadcast; NOT EXISTS is a left-anti join on the
        // order key; the average is exact (integer-cents sum / count,
        // one double division per engine).
        val cust = Tables.customer(s, d)
          .select(col("c_custkey"), col("c_nationkey"),
            floor(col("c_acctbal") * 100.0 + 0.5).as("bal_c"))
        val bar = cust.where(col("bal_c") > 0)
          .agg((sum(col("bal_c")).cast("double") /
            count(lit(1)).cast("double")).as("avg_c"))
        cust.crossJoin(broadcast(bar))
          .where(col("bal_c").cast("double") > col("avg_c"))
          .join(Tables.orders(s, d)
              .where(col("o_orderpriority") === "1-URGENT")
              .select("o_custkey"),
            col("c_custkey") === col("o_custkey"), "left_anti")
          .groupBy("c_nationkey")
          .agg(count(lit(1)).as("n_cust"),
            (sum(col("bal_c")).cast("double") / 100.0).as("sum_bal"))
          .orderBy("c_nationkey")
      },
      Some("""WITH c AS (
             |  SELECT c_custkey, c_nationkey,
             |         CAST(floor(c_acctbal * 100.0 + 0.5) AS BIGINT) AS bal_c
             |  FROM customer),
             |bar AS (
             |  SELECT CAST(sum(bal_c) AS DOUBLE) / count(*) AS avg_c
             |  FROM c WHERE bal_c > 0)
             |SELECT c_nationkey, count(*) AS n_cust,
             |       CAST(CAST(sum(bal_c) AS BIGINT) AS DOUBLE) / 100.0 AS sum_bal
             |FROM c, bar
             |WHERE CAST(bal_c AS DOUBLE) > avg_c
             |  AND NOT EXISTS (SELECT 1 FROM orders
             |                  WHERE o_custkey = c_custkey
             |                    AND o_orderpriority = '1-URGENT')
             |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin),
      doc = "TPC-H Q22-style anti-join against a scalar bar: above-average-" +
        "balance customers with no urgent orders, per nation - 1-row " +
        "broadcast bar, left-anti on the filtered order key, exact " +
        "integer-cents average"),

    Q("q21_min_cost_supplier",
      (s, d) => {
        // TPC-H Q2 shape: the correlated MIN subquery (cheapest regional
        // supplier per part) decorrelated into reduce → per-part min →
        // equality join back. Order of operations is the scale story:
        // lineitem reduces to (part, supplier) unit-cost minima FIRST
        // (ONE fact shuffle, map-side partial agg), and only the reduced
        // table touches the dims. The 5-row region-nation subset
        // broadcasts onto supplier; the supplier and part joins are
        // deliberately unhinted — both dims grow linearly with SF
        // (supplier is 10^9 rows at the 100 TB point, NOT broadcastable),
        // so AQE picks broadcast only while they fit. Unit price is
        // quantized to integer cents BEFORE the min so the argmin
        // equality join is exact in both engines; ties keep every
        // cheapest supplier (Q2 semantics), and the top-100 is a total
        // order compiling to TakeOrderedAndProject.
        val asia = broadcast(Tables.nation(s, d)
          .join(Tables.region(s, d).where(col("r_name") === "ASIA"),
            col("n_regionkey") === col("r_regionkey"))
          .select("n_nationkey"))
        val regSupp = Tables.supplier(s, d)
          .select("s_suppkey", "s_name", "s_nationkey")
          .join(asia, col("s_nationkey") === col("n_nationkey"))
          .select("s_suppkey", "s_name")
        val ps = Tables.lineitem(s, d)
          .select(col("l_partkey"), col("l_suppkey"),
            floor(lit(100.0) * col("l_extendedprice") / col("l_quantity")
              + 0.5).cast("long").as("cost_c"))
          .groupBy("l_partkey", "l_suppkey")
          .agg(min(col("cost_c")).as("cost_c"))
        val sized = Tables.part(s, d).where(col("p_size") <= 5)
          .select("p_partkey", "p_name")
        // EAGER (r19): pc feeds both the per-part min and the argmin
        // join back — storing the (part,supplier)-bounded reduced join
        // runs the fact shuffle + dim joins once instead of twice.
        val pc = Materialize.frame(
          ps.join(regSupp, col("l_suppkey") === col("s_suppkey"))
            .join(sized, col("l_partkey") === col("p_partkey")))
        val mc = pc.groupBy(col("l_partkey").as("m_partkey"))
          .agg(min(col("cost_c")).as("min_c"))
        pc.join(mc, col("l_partkey") === col("m_partkey") &&
            col("cost_c") === col("min_c"))
          .select(col("p_partkey"), col("p_name"), col("s_name"),
            (col("cost_c").cast("double") / 100.0).as("unit_cost"))
          .orderBy(col("unit_cost").desc, col("p_partkey"), col("s_name"))
          .limit(100)
      },
      Some("""WITH cost AS (
             |  SELECT l_partkey, l_suppkey,
             |         CAST(min(floor(100.0 * l_extendedprice / l_quantity + 0.5)) AS BIGINT) AS cost_c
             |  FROM lineitem GROUP BY 1, 2),
             |reg AS (
             |  SELECT s_suppkey, s_name FROM supplier
             |  JOIN nation ON n_nationkey = s_nationkey
             |  JOIN region ON r_regionkey = n_regionkey
             |  WHERE r_name = 'ASIA'),
             |pc AS (
             |  SELECT p_partkey, p_name, s_name, cost_c FROM cost
             |  JOIN reg ON s_suppkey = l_suppkey
             |  JOIN part ON p_partkey = l_partkey
             |  WHERE p_size <= 5),
             |m AS (SELECT p_partkey AS mk, min(cost_c) AS min_c
             |      FROM pc GROUP BY 1)
             |SELECT p_partkey, p_name, s_name,
             |       CAST(cost_c AS DOUBLE) / 100.0 AS unit_cost
             |FROM pc JOIN m ON p_partkey = mk AND cost_c = min_c
             |ORDER BY unit_cost DESC, p_partkey, s_name LIMIT 100""".stripMargin),
      doc = "TPC-H Q2-style correlated min: cheapest regional supplier per " +
        "part, decorrelated to reduce-then-min with an exact integer-cents " +
        "equality join back; fact reduced before any dim join"),

    Q("q23_nation_volume",
      (s, d) => {
        // TPC-H Q7 shape: shipping volume between two nations by ship
        // year. Both nation filters broadcast INTO the customer/supplier
        // dim joins (2/25 selectivity applied before any fact join), so
        // the supplier join semi-filters lineitem by ~92% ahead of the
        // only large-large join (lineitem⋈orders on the order key). The
        // dim joins themselves stay unhinted — customer/supplier grow
        // with SF; AQE broadcasts while they fit. The pair predicate is
        // the pre-filtered dims plus one inequality residual; revenue is
        // the q19 decimal discipline (exact, partially aggregated).
        val pair = Tables.nation(s, d)
          .where(col("n_name").isin("NATION_1", "NATION_2"))
        val supp = Tables.supplier(s, d).select("s_suppkey", "s_nationkey")
          .join(broadcast(pair.select(col("n_nationkey"),
            col("n_name").as("supp_nation"))),
            col("s_nationkey") === col("n_nationkey"))
          .select("s_suppkey", "supp_nation")
        val cust = Tables.customer(s, d).select("c_custkey", "c_nationkey")
          .join(broadcast(pair.select(col("n_nationkey").as("n2key"),
            col("n_name").as("cust_nation"))),
            col("c_nationkey") === col("n2key"))
          .select("c_custkey", "cust_nation")
        Tables.lineitem(s, d)
          .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"),
            pround(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4)
              .cast(DecimalType(28, 4)).as("vol"))
          .join(supp, col("l_suppkey") === col("s_suppkey"))
          .join(Tables.orders(s, d).select("o_orderkey", "o_custkey"),
            col("l_orderkey") === col("o_orderkey"))
          .join(cust, col("o_custkey") === col("c_custkey"))
          .where(col("supp_nation") =!= col("cust_nation"))
          .groupBy(col("supp_nation"), col("cust_nation"),
            year(col("l_shipdate")).cast("long").as("l_year"))
          .agg(sum(col("vol")).cast("double").as("revenue"))
          .orderBy("supp_nation", "cust_nation", "l_year")
      },
      Some("""SELECT supp_nation, cust_nation, l_year,
             |       CAST(sum(vol) AS DOUBLE) AS revenue
             |FROM (
             |  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             |         CAST(year(l_shipdate) AS BIGINT) AS l_year,
             |         CAST(floor(l_extendedprice * (1.0 - l_discount) * 10000.0 + 0.5) / 10000.0 AS DECIMAL(28,4)) AS vol
             |  FROM lineitem
             |  JOIN supplier ON s_suppkey = l_suppkey
             |  JOIN orders ON o_orderkey = l_orderkey
             |  JOIN customer ON c_custkey = o_custkey
             |  JOIN nation n1 ON n1.n_nationkey = s_nationkey
             |  JOIN nation n2 ON n2.n_nationkey = c_nationkey
             |  WHERE n1.n_name IN ('NATION_1', 'NATION_2')
             |    AND n2.n_name IN ('NATION_1', 'NATION_2')
             |    AND n1.n_name <> n2.n_name) t
             |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin),
      doc = "TPC-H Q7-style nation-pair shipping volume by year: nation " +
        "filters pushed into the dims before any fact join, one " +
        "large-large join, decimal-exact revenue"),

    Q("q24_order_count_dist",
      (s, d) => {
        // TPC-H Q13 shape: the distribution of per-customer order counts,
        // zero-order customers included. Reduce-BEFORE-join: orders
        // collapses to per-customer counts first (one shuffle, partial
        // agg), and only that |customers|-sized table outer-joins the
        // customer keys — the fact table never joins row-by-row. The
        // priority filter plays Q13's `o_comment NOT LIKE` role and
        // pushes to the orders scan; the final histogram is a reduce of
        // |customers| rows to a few dozen. (custdist, c_count) is a
        // unique pair per row, so the two-key sort is a total order.
        val oc = Tables.orders(s, d)
          .where(col("o_orderpriority") =!= "4-NOT SPECIFIED")
          .groupBy("o_custkey").agg(count(lit(1)).as("c_count"))
        Tables.customer(s, d).select("c_custkey")
          .join(oc, col("c_custkey") === col("o_custkey"), "left")
          .select(coalesce(col("c_count"), lit(0L)).as("c_count"))
          .groupBy("c_count").agg(count(lit(1)).as("custdist"))
          .orderBy(col("custdist").desc, col("c_count").desc)
      },
      Some("""WITH oc AS (
             |  SELECT o_custkey, count(*) AS c_count FROM orders
             |  WHERE o_orderpriority <> '4-NOT SPECIFIED'
             |  GROUP BY o_custkey)
             |SELECT coalesce(c_count, 0) AS c_count, count(*) AS custdist
             |FROM customer LEFT JOIN oc ON c_custkey = o_custkey
             |GROUP BY 1 ORDER BY custdist DESC, c_count DESC""".stripMargin),
      doc = "TPC-H Q13-style order-count distribution: orders reduced to " +
        "per-customer counts before the outer join with customer keys; " +
        "histogram reduce at the end"),

    Q("q25_promo_share",
      (s, d) => {
        // TPC-H Q14 shape: promo revenue share in a 3-month ship window —
        // conditional aggregation in ONE fact pass (two sums, no second
        // scan, no self-join). The date window pushes to the parquet
        // scan; the part join stays unhinted (part grows with SF — AQE
        // broadcasts while it fits). Revenue is the q19 decimal
        // discipline; the share is one double division of
        // engine-identical decimal sums.
        val vol = pround(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4)
          .cast(DecimalType(28, 4))
        Tables.lineitem(s, d)
          .where(col("l_shipdate") >= lit("1996-01-01").cast("timestamp_ntz") &&
            col("l_shipdate") < lit("1996-04-01").cast("timestamp_ntz"))
          .select(col("l_partkey"), vol.as("vol"))
          .join(Tables.part(s, d).select("p_partkey", "p_type"),
            col("l_partkey") === col("p_partkey"))
          .agg(
            coalesce(sum(when(col("p_type") === "PROMO", col("vol"))),
              lit(0).cast(DecimalType(28, 4))).cast("double").as("promo_revenue"),
            sum(col("vol")).cast("double").as("total_revenue"))
          .select(col("promo_revenue"), col("total_revenue"),
            pround(lit(100.0) * col("promo_revenue") / col("total_revenue"), 6)
              .as("promo_share_pct"))
      },
      Some("""WITH f AS (
             |  SELECT p_type,
             |         CAST(floor(l_extendedprice * (1.0 - l_discount) * 10000.0 + 0.5) / 10000.0 AS DECIMAL(28,4)) AS vol
             |  FROM lineitem JOIN part ON p_partkey = l_partkey
             |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
             |    AND l_shipdate < TIMESTAMP '1996-04-01'),
             |a AS (
             |  SELECT CAST(coalesce(sum(CASE WHEN p_type = 'PROMO' THEN vol END),
             |                       CAST(0 AS DECIMAL(28,4))) AS DOUBLE) AS promo_revenue,
             |         CAST(sum(vol) AS DOUBLE) AS total_revenue
             |  FROM f)
             |SELECT promo_revenue, total_revenue,
             |       floor(100.0 * promo_revenue / total_revenue * 1000000.0 + 0.5) / 1000000.0 AS promo_share_pct
             |FROM a""".stripMargin),
      doc = "TPC-H Q14-style promo revenue share: conditional aggregation " +
        "in one fact pass, ship-window pushed to the scan, decimal-exact " +
        "sums with a single double division at the end"),

    Q("q26_supplier_census",
      (s, d) => {
        // TPC-H Q16 shape: distinct-supplier cardinality per part
        // attribute, minus a blacklist. The fact table reduces to
        // DISTINCT (partkey, suppkey) pairs FIRST (the partsupp
        // reconstruction — one shuffle, and the distinct is exactly the
        // partial-agg shape), the blacklist is a left-anti against the
        // tiny negative-balance supplier set, and only the reduced pair
        // table joins part. The final count(DISTINCT suppkey) runs over
        // pairs, not fact rows. Group keys are unique, so
        // (cnt DESC, brand, size) is a total order.
        val pairs = Tables.lineitem(s, d)
          .select("l_partkey", "l_suppkey").distinct()
        val bad = Tables.supplier(s, d)
          .where(col("s_acctbal") < 0).select("s_suppkey")
        pairs
          .join(bad, col("l_suppkey") === col("s_suppkey"), "left_anti")
          .join(Tables.part(s, d)
            .where(col("p_brand") =!= "Brand#1")
            .select("p_partkey", "p_brand", "p_size"),
            col("l_partkey") === col("p_partkey"))
          .groupBy("p_brand", "p_size")
          .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
          .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_size"))
      },
      Some("""WITH pairs AS (
             |  SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
             |ok AS (
             |  SELECT l_partkey, l_suppkey FROM pairs
             |  WHERE NOT EXISTS (SELECT 1 FROM supplier
             |                    WHERE s_suppkey = l_suppkey AND s_acctbal < 0))
             |SELECT p_brand, p_size,
             |       count(DISTINCT l_suppkey) AS supplier_cnt
             |FROM ok JOIN part ON p_partkey = l_partkey
             |WHERE p_brand <> 'Brand#1'
             |GROUP BY 1, 2
             |ORDER BY supplier_cnt DESC, p_brand, p_size""".stripMargin),
      doc = "TPC-H Q16-style supplier-cardinality census: fact reduced to " +
        "distinct (part, supplier) pairs before any join, blacklist as a " +
        "left-anti, count(DISTINCT) over the reduced pairs"),

    Q("q27_market_share",
      (s, d) => {
        // TPC-H Q8 shape: one supplier nation's share of a region's
        // ECONOMY-part market by order year. Join-order discipline: the
        // part-type filter (1/6 selectivity) lands on the part scan and
        // semi-filters lineitem through the FIRST join, so the only
        // large-large join (⋈ orders on the order key) runs on the
        // reduced fact. Customer-side region restriction is two
        // broadcast dims (nation⋈region prefiltered on the driver-known
        // region name); supplier-side nation name arrives the same way.
        // The share itself is conditional aggregation in one pass — no
        // second scan, no self-join — with the q19 decimal discipline
        // and one double division at the end.
        val vol = pround(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4)
          .cast(DecimalType(28, 4))
        val asiaNations = Tables.nation(s, d)
          .join(broadcast(Tables.region(s, d)
            .where(col("r_name") === "ASIA").select("r_regionkey")),
            col("n_regionkey") === col("r_regionkey"))
          .select(col("n_nationkey").as("cn_key"))
        val cust = Tables.customer(s, d).select("c_custkey", "c_nationkey")
          .join(broadcast(asiaNations), col("c_nationkey") === col("cn_key"))
          .select("c_custkey")
        val supp = Tables.supplier(s, d).select("s_suppkey", "s_nationkey")
          .join(broadcast(Tables.nation(s, d)
            .select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))),
            col("s_nationkey") === col("sn_key"))
          .select("s_suppkey", "supp_nation")
        Tables.lineitem(s, d)
          .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
            vol.as("vol"))
          .join(Tables.part(s, d).where(col("p_type") === "ECONOMY")
            .select("p_partkey"), col("l_partkey") === col("p_partkey"))
          .join(Tables.orders(s, d)
            .where(col("o_orderdate") >= lit("1996-01-01").cast("timestamp_ntz") &&
              col("o_orderdate") < lit("1998-01-01").cast("timestamp_ntz"))
            .select("o_orderkey", "o_custkey", "o_orderdate"),
            col("l_orderkey") === col("o_orderkey"))
          .join(cust, col("o_custkey") === col("c_custkey"))
          .join(supp, col("l_suppkey") === col("s_suppkey"))
          .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
          .agg(
            coalesce(sum(when(col("supp_nation") === "NATION_2", col("vol"))),
              lit(0).cast(DecimalType(28, 4))).cast("double").as("nation_volume"),
            sum(col("vol")).cast("double").as("total_volume"))
          .select(col("o_year"), col("nation_volume"), col("total_volume"),
            pround(col("nation_volume") / col("total_volume"), 6).as("mkt_share"))
          .orderBy("o_year")
      },
      Some("""WITH f AS (
             |  SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
             |         n2.n_name AS supp_nation,
             |         CAST(floor(l_extendedprice * (1.0 - l_discount) * 10000.0 + 0.5) / 10000.0 AS DECIMAL(28,4)) AS vol
             |  FROM lineitem
             |  JOIN part ON p_partkey = l_partkey AND p_type = 'ECONOMY'
             |  JOIN orders ON o_orderkey = l_orderkey
             |  JOIN customer ON c_custkey = o_custkey
             |  JOIN nation n1 ON n1.n_nationkey = c_nationkey
             |  JOIN region ON r_regionkey = n1.n_regionkey AND r_name = 'ASIA'
             |  JOIN supplier ON s_suppkey = l_suppkey
             |  JOIN nation n2 ON n2.n_nationkey = s_nationkey
             |  WHERE o_orderdate >= TIMESTAMP '1996-01-01'
             |    AND o_orderdate < TIMESTAMP '1998-01-01'),
             |a AS (
             |  SELECT o_year,
             |         CAST(coalesce(sum(CASE WHEN supp_nation = 'NATION_2' THEN vol END),
             |                       CAST(0 AS DECIMAL(28,4))) AS DOUBLE) AS nation_volume,
             |         CAST(sum(vol) AS DOUBLE) AS total_volume
             |  FROM f GROUP BY 1)
             |SELECT o_year, nation_volume, total_volume,
             |       floor(nation_volume / total_volume * 1000000.0 + 0.5) / 1000000.0 AS mkt_share
             |FROM a ORDER BY o_year""".stripMargin),
      doc = "TPC-H Q8-style national market share: part-type filter " +
        "semi-filters the fact before the large-large join, region " +
        "restriction via broadcast dims, share as one-pass conditional " +
        "aggregation"),

    Q("q28_profit_by_nation",
      (s, d) => {
        // TPC-H Q9 shape: profit by supplier nation and order year. The
        // schema has no partsupp, so supply cost is reconstructed as
        // 1% of p_retailprice per unit (documented synthetic, applied
        // identically in the oracle). The p_name filter pushes to the
        // part scan; amount is computed per fact row under the decimal
        // discipline BEFORE the group-by, so the (nation, year) agg is
        // map-side combinable. The only large-large join is ⋈ orders on
        // the order key; supplier→nation is two chained dims.
        val amount = pround(
          col("l_extendedprice") * (lit(1.0) - col("l_discount")) -
            col("p_retailprice") * col("l_quantity") * lit(0.01), 4)
          .cast(DecimalType(28, 4))
        Tables.lineitem(s, d)
          .select("l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
            "l_extendedprice", "l_discount")
          .join(Tables.part(s, d).where(col("p_name").like("%red%"))
            .select("p_partkey", "p_retailprice"),
            col("l_partkey") === col("p_partkey"))
          .join(Tables.orders(s, d).select("o_orderkey", "o_orderdate"),
            col("l_orderkey") === col("o_orderkey"))
          .join(Tables.supplier(s, d).select("s_suppkey", "s_nationkey"),
            col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(Tables.nation(s, d)
            .select(col("n_nationkey"), col("n_name").as("nation"))),
            col("s_nationkey") === col("n_nationkey"))
          .groupBy(col("nation"),
            year(col("o_orderdate")).cast("long").as("o_year"))
          .agg(sum(amount).cast("double").as("sum_profit"))
          .orderBy(col("nation"), col("o_year").desc)
      },
      Some("""SELECT n_name AS nation,
             |       CAST(year(o_orderdate) AS BIGINT) AS o_year,
             |       CAST(sum(CAST(floor((l_extendedprice * (1.0 - l_discount)
             |                            - p_retailprice * l_quantity * 0.01) * 10000.0 + 0.5)
             |                     / 10000.0 AS DECIMAL(28,4))) AS DOUBLE) AS sum_profit
             |FROM lineitem
             |JOIN part ON p_partkey = l_partkey AND p_name LIKE '%red%'
             |JOIN orders ON o_orderkey = l_orderkey
             |JOIN supplier ON s_suppkey = l_suppkey
             |JOIN nation ON n_nationkey = s_nationkey
             |GROUP BY 1, 2 ORDER BY nation, o_year DESC""".stripMargin),
      doc = "TPC-H Q9-style profit by supplier nation and year: synthetic " +
        "supply cost (1% retailprice/unit, no partsupp in the schema), " +
        "per-row decimal amount before a combinable (nation, year) agg"),

    Q("q29_returned_customers",
      (s, d) => {
        // TPC-H Q10 shape: top-20 customers by revenue lost to returns in
        // one quarter. The quarter filter pushes to the orders scan and
        // the returnflag filter to the lineitem scan, so the large-large
        // join runs on both facts pre-reduced. Revenue reduces to
        // per-customer BEFORE the customer/nation dims join (reduce-then-
        // join: the dims see |customers| rows, not fact rows). Top-20
        // compiles to TakeOrderedAndProject — revenue DESC with the
        // unique custkey tiebreak makes it a total order.
        val vol = pround(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4)
          .cast(DecimalType(28, 4))
        val perCust = Tables.lineitem(s, d)
          .where(col("l_returnflag") === "R")
          .select(col("l_orderkey"), vol.as("vol"))
          .join(Tables.orders(s, d)
            .where(col("o_orderdate") >= lit("1996-01-01").cast("timestamp_ntz") &&
              col("o_orderdate") < lit("1996-04-01").cast("timestamp_ntz"))
            .select("o_orderkey", "o_custkey"),
            col("l_orderkey") === col("o_orderkey"))
          .groupBy("o_custkey")
          .agg(sum(col("vol")).cast("double").as("revenue"))
        perCust
          .join(Tables.customer(s, d)
            .select("c_custkey", "c_name", "c_nationkey", "c_acctbal"),
            col("o_custkey") === col("c_custkey"))
          .join(broadcast(Tables.nation(s, d)
            .select(col("n_nationkey"), col("n_name").as("nation"))),
            col("c_nationkey") === col("n_nationkey"))
          .select("c_custkey", "c_name", "nation", "c_acctbal", "revenue")
          .orderBy(col("revenue").desc, col("c_custkey"))
          .limit(20)
      },
      Some("""WITH pc AS (
             |  SELECT o_custkey,
             |         CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * 10000.0 + 0.5)
             |                       / 10000.0 AS DECIMAL(28,4))) AS DOUBLE) AS revenue
             |  FROM lineitem JOIN orders ON o_orderkey = l_orderkey
             |  WHERE l_returnflag = 'R'
             |    AND o_orderdate >= TIMESTAMP '1996-01-01'
             |    AND o_orderdate < TIMESTAMP '1996-04-01'
             |  GROUP BY 1)
             |SELECT c_custkey, c_name, n_name AS nation, c_acctbal, revenue
             |FROM pc
             |JOIN customer ON c_custkey = o_custkey
             |JOIN nation ON n_nationkey = c_nationkey
             |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin),
      doc = "TPC-H Q10-style returned-revenue top-20: both facts " +
        "pre-filtered at the scan, revenue reduced per customer before " +
        "the dim joins, TakeOrderedAndProject top-k"),

    Q("q30_late_ship_priority",
      (s, d) => {
        // TPC-H Q12 shape: per line-status, how many high- vs low-
        // priority orders shipped late. The schema has no shipmode or
        // commit/receipt dates, so l_linestatus plays the shipmode group
        // and "late" is shipped >60 days after the order date — an
        // interval predicate across the two facts, evaluated AFTER the
        // equality join (it can't push below it). The ship-year filter
        // DOES push to the lineitem scan. Priority classification is
        // one-pass conditional counting, Q12's exact shape.
        Tables.lineitem(s, d)
          .where(col("l_shipdate") >= lit("1997-01-01").cast("timestamp_ntz") &&
            col("l_shipdate") < lit("1998-01-01").cast("timestamp_ntz"))
          .select("l_orderkey", "l_linestatus", "l_shipdate")
          .join(Tables.orders(s, d)
            .select("o_orderkey", "o_orderdate", "o_orderpriority"),
            col("l_orderkey") === col("o_orderkey"))
          .where(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAY"))
          .groupBy("l_linestatus")
          .agg(
            sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
              .otherwise(0L)).as("high_line_count"),
            sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 0L)
              .otherwise(1L)).as("low_line_count"))
          .orderBy("l_linestatus")
      },
      Some("""SELECT l_linestatus,
             |       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
             |                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
             |       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
             |                THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
             |FROM lineitem JOIN orders ON o_orderkey = l_orderkey
             |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
             |  AND l_shipdate < TIMESTAMP '1998-01-01'
             |  AND l_shipdate > o_orderdate + INTERVAL 60 DAY
             |GROUP BY 1 ORDER BY 1""".stripMargin),
      doc = "TPC-H Q12-style late-shipment priority counts: ship-year " +
        "filter pushed to the scan, cross-fact interval predicate as a " +
        "post-join residual, one-pass conditional counting"),

    Q("q31_grouping_sets",
      (s, d) => {
        // Explicit GROUPING SETS (the general form q11's ROLLUP and
        // q16's CUBE are sugar for): order revenue at (region, nation),
        // (region), and grand-total granularities in ONE pass — Spark
        // plans a single Expand + hash aggregate, not three scans with a
        // union. grouping() flags disambiguate "NULL because aggregated
        // away" from a genuinely null dimension. Dims broadcast; the
        // decimal revenue stays map-side combinable under Expand.
        val dims = Tables.nation(s, d)
          .join(broadcast(Tables.region(s, d)),
            col("n_regionkey") === col("r_regionkey"))
          .select(col("n_nationkey"), col("n_name").as("nation"),
            col("r_name").as("region"))
        Tables.orders(s, d)
          .select(col("o_custkey"),
            pround(col("o_totalprice"), 4).cast(DecimalType(28, 4)).as("price"))
          .join(Tables.customer(s, d).select("c_custkey", "c_nationkey"),
            col("o_custkey") === col("c_custkey"))
          .join(broadcast(dims), col("c_nationkey") === col("n_nationkey"))
          .groupingSets(
            Seq(Seq(col("region"), col("nation")), Seq(col("region")), Seq()),
            col("region"), col("nation"))
          .agg(grouping(col("region")).cast("long").as("g_region"),
            grouping(col("nation")).cast("long").as("g_nation"),
            count(lit(1)).as("n_orders"),
            sum(col("price")).cast("double").as("revenue"))
          .orderBy("g_region", "g_nation", "region", "nation")
      },
      Some("""WITH base AS (
             |  SELECT r_name AS region, n_name AS nation,
             |         CAST(floor(o_totalprice * 10000.0 + 0.5) / 10000.0
             |              AS DECIMAL(28,4)) AS price
             |  FROM orders
             |  JOIN customer ON c_custkey = o_custkey
             |  JOIN nation ON n_nationkey = c_nationkey
             |  JOIN region ON r_regionkey = n_regionkey)
             |SELECT region, nation,
             |       GROUPING(region) AS g_region, GROUPING(nation) AS g_nation,
             |       count(*) AS n_orders, CAST(sum(price) AS DOUBLE) AS revenue
             |FROM base
             |GROUP BY GROUPING SETS ((region, nation), (region), ())
             |ORDER BY g_region, g_nation, region, nation""".stripMargin),
      doc = "explicit GROUPING SETS at three granularities in one Expand " +
        "+ aggregate pass, grouping() flags to disambiguate aggregated " +
        "NULLs, broadcast dims"),

    Q("q32_unpivot",
      (s, d) => {
        // Wide→long unpivot (melt), the inverse of r5's pivot: per-nation
        // customer/supplier counts and balances as a wide table, melted
        // to (nation, metric, value) rows. Each side reduces to |nations|
        // rows BEFORE the join (reduce-then-join); the unpivot itself is
        // a zero-shuffle Expand — 4 output rows per input row, no
        // repartitioning, so the long form costs nothing extra at scale.
        val nat = Tables.nation(s, d)
          .select(col("n_nationkey"), col("n_name").as("nation"))
        val cust = Tables.customer(s, d)
          .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
          .groupBy("nation")
          .agg(count(lit(1)).cast("double").as("n_cust"),
            sum(pround(col("c_acctbal"), 2).cast(DecimalType(28, 2)))
              .cast("double").as("cust_bal"))
        val supp = Tables.supplier(s, d)
          .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
          .groupBy("nation")
          .agg(count(lit(1)).cast("double").as("n_supp"),
            sum(pround(col("s_acctbal"), 2).cast(DecimalType(28, 2)))
              .cast("double").as("supp_bal"))
        cust.join(supp, Seq("nation"))
          .unpivot(Array(col("nation")),
            Array(col("n_cust"), col("cust_bal"), col("n_supp"), col("supp_bal")),
            "metric", "value")
          .orderBy("nation", "metric")
      },
      Some("""WITH c AS (
             |  SELECT n_name AS nation, CAST(count(*) AS DOUBLE) AS n_cust,
             |         CAST(sum(CAST(floor(c_acctbal * 100.0 + 0.5) / 100.0
             |                       AS DECIMAL(28,2))) AS DOUBLE) AS cust_bal
             |  FROM customer JOIN nation ON n_nationkey = c_nationkey
             |  GROUP BY 1),
             |s AS (
             |  SELECT n_name AS nation, CAST(count(*) AS DOUBLE) AS n_supp,
             |         CAST(sum(CAST(floor(s_acctbal * 100.0 + 0.5) / 100.0
             |                       AS DECIMAL(28,2))) AS DOUBLE) AS supp_bal
             |  FROM supplier JOIN nation ON n_nationkey = s_nationkey
             |  GROUP BY 1),
             |w AS (SELECT c.nation, n_cust, cust_bal, n_supp, supp_bal
             |      FROM c JOIN s ON c.nation = s.nation)
             |SELECT nation, metric, value FROM (
             |  SELECT nation, 'n_cust' AS metric, n_cust AS value FROM w
             |  UNION ALL
             |  SELECT nation, 'cust_bal', cust_bal FROM w
             |  UNION ALL
             |  SELECT nation, 'n_supp', n_supp FROM w
             |  UNION ALL
             |  SELECT nation, 'supp_bal', supp_bal FROM w)
             |ORDER BY nation, metric""".stripMargin),
      doc = "wide-to-long unpivot (inverse of r5's pivot): reduce-then-" +
        "join wide build, zero-shuffle Expand melt to (nation, metric, " +
        "value)"),

    Q("q33_percent_rank",
      (s, d) => {
        // Relative-standing windows (percent_rank + cume_dist): supplier
        // balance standing within nation. Ordering is by EXACT integer
        // cents with the unique suppkey tiebreak — a float orderBy could
        // rank last-ulp-different balances differently per engine, and
        // the unique ordering makes cume_dist peer groups singletons
        // (deterministic). One window pass partitioned by nation — the
        // partition key scales out; no global ordering anywhere.
        val w = Window.partitionBy("nation")
          .orderBy(col("cents"), col("s_suppkey"))
        Tables.supplier(s, d)
          .join(broadcast(Tables.nation(s, d)
            .select(col("n_nationkey"), col("n_name").as("nation"))),
            col("s_nationkey") === col("n_nationkey"))
          .select(col("nation"), col("s_suppkey"),
            expr("cast(floor(s_acctbal * 100.0 + 0.5) as bigint)").as("cents"))
          .select(col("nation"), col("s_suppkey"),
            (col("cents").cast("double") / 100.0).as("bal"),
            pround(percent_rank().over(w), 9).as("pr"),
            pround(cume_dist().over(w), 9).as("cd"))
          .orderBy("nation", "s_suppkey")
      },
      Some("""WITH b AS (
             |  SELECT n_name AS nation, s_suppkey,
             |         CAST(floor(s_acctbal * 100.0 + 0.5) AS BIGINT) AS cents
             |  FROM supplier JOIN nation ON n_nationkey = s_nationkey)
             |SELECT nation, s_suppkey, CAST(cents AS DOUBLE) / 100.0 AS bal,
             |       floor(percent_rank() OVER (PARTITION BY nation
             |               ORDER BY cents, s_suppkey) * 1000000000.0 + 0.5)
             |         / 1000000000.0 AS pr,
             |       floor(cume_dist() OVER (PARTITION BY nation
             |               ORDER BY cents, s_suppkey) * 1000000000.0 + 0.5)
             |         / 1000000000.0 AS cd
             |FROM b ORDER BY nation, s_suppkey""".stripMargin),
      doc = "percent_rank + cume_dist relative standing within nation: " +
        "exact integer-cents ordering with unique tiebreak (engine-" +
        "portable ranks), one nation-partitioned window pass"),

    Q("q34_big_orders",
      (s, d) => {
        // TPC-H Q18 shape: large-volume orders (total quantity > 300, the
        // Q18 threshold). The correlated HAVING decorrelates to
        // reduce-then-join: lineitem collapses to per-order quantity
        // sums FIRST (one combinable shuffle), the >300 filter cuts that
        // reduced table to a sliver, and only the sliver joins orders
        // and customer — the fact never joins row-by-row. Quantity sums
        // use the q1 decimal discipline; top-20 by totalprice is
        // TakeOrderedAndProject with the unique orderkey tiebreak.
        val oq = Tables.lineitem(s, d)
          .select(col("l_orderkey"),
            pround(col("l_quantity"), 6).cast(DecimalType(28, 6)).as("q"))
          .groupBy("l_orderkey")
          .agg(sum(col("q")).as("tot_qty"))
          .where(col("tot_qty") > 300)
        oq.join(Tables.orders(s, d)
            .select("o_orderkey", "o_custkey", "o_totalprice"),
            col("l_orderkey") === col("o_orderkey"))
          .join(Tables.customer(s, d).select("c_custkey", "c_name"),
            col("o_custkey") === col("c_custkey"))
          .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
            pround(col("o_totalprice"), 2).as("o_totalprice"),
            col("tot_qty").cast("double").as("tot_qty"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
          .limit(20)
      },
      Some("""WITH oq AS (
             |  SELECT l_orderkey,
             |         sum(CAST(floor(l_quantity * 1000000.0 + 0.5) / 1000000.0
             |                  AS DECIMAL(28,6))) AS tot_qty
             |  FROM lineitem GROUP BY 1 HAVING tot_qty > 300),
             |j AS (
             |  SELECT c_custkey, c_name, o_orderkey,
             |         floor(o_totalprice * 100.0 + 0.5) / 100.0 AS o_totalprice,
             |         CAST(tot_qty AS DOUBLE) AS tot_qty
             |  FROM oq
             |  JOIN orders ON o_orderkey = l_orderkey
             |  JOIN customer ON c_custkey = o_custkey)
             |SELECT * FROM j
             |ORDER BY o_totalprice DESC, o_orderkey LIMIT 20""".stripMargin),
      doc = "TPC-H Q18-style large-volume orders: correlated HAVING " +
        "decorrelated to reduce-then-join (per-order quantity sums " +
        "filtered before any join), TakeOrderedAndProject top-20"),

    Q("q35_disjunctive_revenue",
      (s, d) => {
        // TPC-H Q19 shape: revenue under an OR of three conjunctive
        // (brand, size-range, quantity-range) branches — the disjunctive-
        // predicate stress test. The common denominator of the branches
        // (size between 1 and 40, quantity between 1 and 50) pushes to
        // the two scans as a residual-OR's bounding box; the exact OR
        // evaluates at the join. One pass, one decimal scalar.
        val branch =
          (col("p_brand") === "Brand#1" && col("p_size").between(1, 10) &&
            col("l_quantity").between(1, 20)) ||
          (col("p_brand") === "Brand#2" && col("p_size").between(5, 20) &&
            col("l_quantity").between(10, 30)) ||
          (col("p_brand") === "Brand#3" && col("p_size").between(10, 40) &&
            col("l_quantity").between(20, 50))
        Tables.lineitem(s, d)
          .select(col("l_partkey"), col("l_quantity"),
            pround(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4)
              .cast(DecimalType(28, 4)).as("vol"))
          .join(Tables.part(s, d).select("p_partkey", "p_brand", "p_size"),
            col("l_partkey") === col("p_partkey"))
          .where(branch)
          .agg(count(lit(1)).as("n_lines"),
            sum(col("vol")).cast("double").as("revenue"))
      },
      Some("""SELECT count(*) AS n_lines,
             |       CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * 10000.0 + 0.5)
             |                     / 10000.0 AS DECIMAL(28,4))) AS DOUBLE) AS revenue
             |FROM lineitem JOIN part ON p_partkey = l_partkey
             |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 10
             |       AND l_quantity BETWEEN 1 AND 20)
             |   OR (p_brand = 'Brand#2' AND p_size BETWEEN 5 AND 20
             |       AND l_quantity BETWEEN 10 AND 30)
             |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 10 AND 40
             |       AND l_quantity BETWEEN 20 AND 50)""".stripMargin),
      doc = "TPC-H Q19-style disjunctive-predicate revenue: OR of three " +
        "conjunctive branches evaluated in one join pass, decimal-exact " +
        "scalar"),

    Q("q36_local_supplier_volume",
      (s, d) => {
        // TPC-H Q5 shape — the one classic shape the suite lacked: the
        // LOCAL-supply constraint c_nationkey = s_nationkey correlates
        // two different dimension paths to the same fact row, so the
        // supplier join carries a second, non-key equality. Dims filter
        // FIRST (one region, one order year), broadcast into the fact
        // chain; the only big shuffles are the two fact equi-joins
        // (orders⋈customer-pruned orders, then lineitem), and revenue
        // sums exact fixed-point units per |nations|-bounded group.
        val nations = Tables.nation(s, d)
          .join(Tables.region(s, d).where(col("r_name") === "ASIA"),
            col("n_regionkey") === col("r_regionkey"))
          .select(col("n_nationkey"), col("n_name"))
        val cust = Tables.customer(s, d)
          .join(broadcast(nations), col("c_nationkey") === col("n_nationkey"))
          .select(col("c_custkey"), col("c_nationkey"), col("n_name"))
        val ord = Tables.orders(s, d)
          .where(col("o_orderdate") >= lit("1996-01-01").cast("timestamp_ntz") &&
            col("o_orderdate") < lit("1997-01-01").cast("timestamp_ntz"))
          .select("o_orderkey", "o_custkey")
        val li = Tables.lineitem(s, d)
          .select(col("l_orderkey"), col("l_suppkey"),
            floor(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
              * 10000.0 + 0.5).cast(DecimalType(38, 0)).as("u"))
        // customer and supplier are FACT-sized at warehouse scale (only
        // nation×region is broadcast); these equi-joins shuffle on their
        // keys and AQE may still elect broadcast at small SF
        ord.join(cust, col("o_custkey") === col("c_custkey"))
          .join(li, col("l_orderkey") === col("o_orderkey"))
          .join(Tables.supplier(s, d).select("s_suppkey", "s_nationkey"),
            col("s_suppkey") === col("l_suppkey") &&
              col("s_nationkey") === col("c_nationkey"))
          .groupBy("n_name")
          .agg((sum("u").cast("double") / 10000.0).as("revenue"))
          .orderBy(desc("revenue"), col("n_name"))
      },
      Some("""SELECT n_name,
             |       CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * 10000.0 + 0.5) AS HUGEINT)) AS DOUBLE) / 10000.0 AS revenue
             |FROM customer
             |JOIN nation ON n_nationkey = c_nationkey
             |JOIN region ON r_regionkey = n_regionkey AND r_name = 'ASIA'
             |JOIN orders ON o_custkey = c_custkey
             |JOIN lineitem ON l_orderkey = o_orderkey
             |JOIN supplier ON s_suppkey = l_suppkey
             |              AND s_nationkey = c_nationkey
             |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
             |  AND o_orderdate < TIMESTAMP '1997-01-01'
             |GROUP BY n_name
             |ORDER BY revenue DESC, n_name""".stripMargin),
      doc = "TPC-H Q5-style local-supplier volume: correlated dim paths " +
        "(c_nationkey = s_nationkey on the same fact row), filtered dims " +
        "broadcast ahead of the two fact shuffles, exact fixed-point " +
        "revenue per bounded nation group"),

    Q("q37_month_growth",
      (s, d) => {
        // Month-over-month growth — the report-page staple q10's running
        // total doesn't cover: orders reduce to one exact-cents row per
        // CALENDAR MONTH in a single combinable pass, and lag/growth run
        // over that |months|-bounded table (single-partition window over
        // dozens of rows, never facts). First month's growth is null by
        // construction, not 0 — shared CASE tree with the oracle.
        val w = Window.orderBy("ym")
        Tables.orders(s, d)
          .select((year(col("o_orderdate")) * 100 + month(col("o_orderdate")))
            .as("ym"),
            expr("cast(floor(o_totalprice * 100.0 + 0.5) as bigint)").as("c"))
          .groupBy("ym").agg(sum("c").as("rev_cents"))
          .withColumn("prev_cents", lag(col("rev_cents"), 1).over(w))
          .select(col("ym"), col("rev_cents"), col("prev_cents"),
            pround(expr(monthGrowthExpr), 9).as("growth"))
          .orderBy("ym")
      },
      Some(s"""WITH m AS (
              |  SELECT date_part('year', o_orderdate) * 100
              |           + date_part('month', o_orderdate) AS ym,
              |         CAST(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT))
              |              AS BIGINT) AS rev_cents
              |  FROM orders GROUP BY 1),
              |l AS (SELECT ym, rev_cents,
              |             lag(rev_cents) OVER (ORDER BY ym) AS prev_cents
              |      FROM m)
              |SELECT ym, rev_cents, prev_cents,
              |       floor(($monthGrowthExpr)
              |             * 1000000000.0 + 0.5) / 1000000000.0 AS growth
              |FROM l ORDER BY ym""".stripMargin),
      doc = "month-over-month revenue growth: facts reduce to one exact-" +
        "cents row per calendar month, lag + growth over the bounded " +
        "month table only; first month null by construction"),

    Q("q38_latest_event",
      (s, d) => {
        // Latest-record-per-key — THE warehouse materialization idiom
        // (current state from an append-only event log, the read side of
        // x8's snapshot upsert). A max_by/struct-max aggregate, NOT a
        // row_number window: the aggregate partial-combines map-side so
        // each partition contributes one candidate row per key, where a
        // window would sort every key's full history on the shuffle.
        // (ts, event_id) ordering makes the pick deterministic under
        // same-timestamp ties. Subset filter keeps the oracle output
        // review-sized; the plan shape is key-count-independent.
        Tables.events(s, d)
          .where(col("user_id") % 100 === 0)
          .select(col("user_id"), col("ts"), col("event_id"),
            col("event_type"),
            expr("cast(floor(value * 100.0 + 0.5) as bigint)").as("c"))
          .groupBy("user_id")
          .agg(max(struct(col("ts"), col("event_id"), col("event_type"),
            col("c"))).as("m"))
          .select(col("user_id"), col("m.ts").as("last_ts"),
            col("m.event_type").as("last_type"),
            col("m.c").as("last_value_cents"))
          .orderBy("user_id")
      },
      Some("""WITH r AS (
             |  SELECT user_id, ts, event_type,
             |         CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS c,
             |         row_number() OVER (PARTITION BY user_id
             |           ORDER BY ts DESC, event_id DESC) AS rn
             |  FROM events WHERE user_id % 100 = 0)
             |SELECT user_id, ts AS last_ts, event_type AS last_type,
             |       c AS last_value_cents
             |FROM r WHERE rn = 1 ORDER BY user_id""".stripMargin),
      doc = "latest-record-per-key (current-state read of an event log): " +
        "struct-max AGGREGATE, not a window — partials combine map-side " +
        "to one candidate per key per partition; (ts, event_id) tiebreak"),

    Q("q39_customer_accum",
      (s, d) => {
        // Customer-accumulation curve: per month, how many customers
        // place their FIRST order, and the running total — the growth
        // chart behind every "cumulative users" slide. Facts reduce to
        // one row per customer (combinable min), then to |months| rows;
        // the cumulative window runs over that bounded month table only
        // (q37's discipline).
        val w = Window.orderBy("ym")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables.orders(s, d)
          .select(col("o_custkey"),
            (year(col("o_orderdate")) * 100 + month(col("o_orderdate")))
              .as("ym"))
          .groupBy("o_custkey").agg(min("ym").as("first_ym"))
          .groupBy(col("first_ym").as("ym"))
          .agg(count(lit(1)).as("n_new_customers"))
          .withColumn("cum_customers", sum("n_new_customers").over(w))
          .orderBy("ym")
      },
      Some("""WITH f AS (
             |  SELECT o_custkey,
             |         min(date_part('year', o_orderdate) * 100
             |             + date_part('month', o_orderdate)) AS ym
             |  FROM orders GROUP BY 1),
             |m AS (SELECT ym, count(*) AS n_new_customers FROM f GROUP BY 1)
             |SELECT ym, n_new_customers,
             |       CAST(sum(n_new_customers) OVER (ORDER BY ym ROWS BETWEEN
             |         UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             |         AS cum_customers
             |FROM m ORDER BY ym""".stripMargin),
      doc = "customer-accumulation curve: combinable first-order-month " +
        "reduction per customer, cumulative window over the bounded " +
        "month table only"),

    Q("q40_nation_trade",
      (s, d) => {
        // TPC-H Q7 shape (volume shipping): revenue flowing between an
        // ordered pair of nations by ship year. Two INDEPENDENT dim paths
        // reach the same fact row — supplier nation via l_suppkey, customer
        // nation via orders→customer — so unlike q36 there is no
        // correlated-equality shortcut; the pair predicate is a
        // disjunction over both directions. The 2-row filtered nation dim
        // broadcasts into supplier and customer BEFORE the fact joins,
        // shrinking both sides to the two nations' keys; the only big
        // shuffles are lineitem⋈supplier (suppkey) and the
        // orders⋈customer + lineitem⋈orders chain (custkey/orderkey).
        // Revenue sums exact fixed-point units per (nation, nation, year)
        // — a bounded group space.
        val nations = Tables.nation(s, d)
          .where(col("n_name").isin("NATION_1", "NATION_2"))
          .select(col("n_nationkey"), col("n_name"))
        val supp = Tables.supplier(s, d)
          .join(broadcast(nations), col("s_nationkey") === col("n_nationkey"))
          .select(col("s_suppkey"), col("n_name").as("supp_nation"))
        val cust = Tables.customer(s, d)
          .join(broadcast(nations), col("c_nationkey") === col("n_nationkey"))
          .select(col("c_custkey"), col("n_name").as("cust_nation"))
        val ord = Tables.orders(s, d).select("o_orderkey", "o_custkey")
          .join(cust, col("o_custkey") === col("c_custkey"))
          .select("o_orderkey", "cust_nation")
        Tables.lineitem(s, d)
          .where(col("l_shipdate") >= lit("1995-01-01").cast("timestamp_ntz") &&
            col("l_shipdate") < lit("1997-01-01").cast("timestamp_ntz"))
          .select(col("l_orderkey"), col("l_suppkey"),
            year(col("l_shipdate")).as("l_year"),
            floor(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
              * 10000.0 + 0.5).cast(DecimalType(38, 0)).as("u"))
          .join(supp, col("l_suppkey") === col("s_suppkey"))
          .join(ord, col("l_orderkey") === col("o_orderkey"))
          .where((col("supp_nation") === "NATION_1" &&
            col("cust_nation") === "NATION_2") ||
            (col("supp_nation") === "NATION_2" &&
              col("cust_nation") === "NATION_1"))
          .groupBy("supp_nation", "cust_nation", "l_year")
          .agg((sum("u").cast("double") / 10000.0).as("revenue"))
          .orderBy("supp_nation", "cust_nation", "l_year")
      },
      Some("""SELECT supp_nation, cust_nation, l_year,
             |       CAST(sum(u) AS DOUBLE) / 10000.0 AS revenue
             |FROM (
             |  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             |         date_part('year', l_shipdate) AS l_year,
             |         CAST(floor(l_extendedprice * (1.0 - l_discount) * 10000.0 + 0.5) AS HUGEINT) AS u
             |  FROM lineitem
             |  JOIN supplier ON s_suppkey = l_suppkey
             |  JOIN nation n1 ON n1.n_nationkey = s_nationkey
             |  JOIN orders ON o_orderkey = l_orderkey
             |  JOIN customer ON c_custkey = o_custkey
             |  JOIN nation n2 ON n2.n_nationkey = c_nationkey
             |  WHERE l_shipdate >= TIMESTAMP '1995-01-01'
             |    AND l_shipdate < TIMESTAMP '1997-01-01'
             |    AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
             |      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
             |) GROUP BY supp_nation, cust_nation, l_year
             |ORDER BY supp_nation, cust_nation, l_year""".stripMargin),
      doc = "TPC-H Q7-style nation-pair trade volume: two independent dim " +
        "paths to the same fact row, 2-row nation dim broadcast into both " +
        "supplier and customer before the fact shuffles, disjunctive pair " +
        "predicate after, exact fixed-point revenue per bounded group"),

    Q("q41_reorder_gaps",
      (s, d) => {
        // Repeat-purchase interval census: how long between a customer's
        // consecutive orders? The lag window partitions on o_custkey (a
        // per-customer sort, shuffled once, never global) with an
        // o_orderkey tiebreak for same-day orders; the gap stream then
        // collapses to one totals row plus the x36 lower median over the
        // |distinct gap| cumulative table — gaps are calendar-bounded
        // integers, so that window's input never grows with the facts.
        val w = Window.partitionBy("o_custkey")
          .orderBy(col("day"), col("o_orderkey"))
        val gaps = Tables.orders(s, d)
          .select(col("o_custkey"), col("o_orderkey"),
            expr("unix_timestamp(o_orderdate) div 86400").as("day"))
          .withColumn("prev", lag("day", 1).over(w))
          .where(col("prev").isNotNull)
          .select(col("o_custkey"), (col("day") - col("prev")).as("gap"))
        val base = gaps.agg(
          countDistinct("o_custkey").as("n_repeat_customers"),
          count(lit(1)).as("n_gaps"), sum("gap").as("sg"))
        val cumW = Window.orderBy("gap")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val med = gaps.groupBy("gap").agg(count(lit(1)).as("cnt"))
          .withColumn("cum", sum("cnt").over(cumW))
          .crossJoin(broadcast(base.select("n_gaps")))
          .where(col("cum") >= expr("(n_gaps + 1) div 2"))
          .agg(min("gap").as("p50_gap_days"))
        base.crossJoin(broadcast(med))
          .select(col("n_repeat_customers"), col("n_gaps"),
            pround(col("sg").cast("double") / col("n_gaps").cast("double"), 6)
              .as("mean_gap_days"),
            col("p50_gap_days"))
      },
      Some("""WITH g AS (
             |  SELECT o_custkey,
             |         CAST(floor(epoch(o_orderdate)) AS BIGINT) // 86400
             |           - lag(CAST(floor(epoch(o_orderdate)) AS BIGINT) // 86400)
             |             OVER (PARTITION BY o_custkey
             |                   ORDER BY CAST(floor(epoch(o_orderdate)) AS BIGINT) // 86400,
             |                            o_orderkey) AS gap
             |  FROM orders),
             |gg AS (SELECT o_custkey, gap FROM g WHERE gap IS NOT NULL),
             |base AS (
             |  SELECT count(DISTINCT o_custkey) AS n_repeat_customers,
             |         CAST(count(*) AS BIGINT) AS n_gaps,
             |         CAST(sum(gap) AS BIGINT) AS sg
             |  FROM gg),
             |med AS (
             |  SELECT min(gap) AS p50_gap_days FROM (
             |    SELECT gap, CAST(count(*) OVER (ORDER BY gap RANGE BETWEEN
             |      UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
             |    FROM gg) c, base WHERE cum >= (n_gaps + 1) // 2)
             |SELECT n_repeat_customers, n_gaps,
             |       floor(CAST(sg AS DOUBLE) / CAST(n_gaps AS DOUBLE)
             |             * 1000000.0 + 0.5) / 1000000.0 AS mean_gap_days,
             |       p50_gap_days
             |FROM base CROSS JOIN med""".stripMargin),
      doc = "repeat-purchase interval census: one per-customer lag " +
        "window (custkey-partitioned, orderkey tiebreak), totals in one " +
        "combinable pass, lower median over the calendar-bounded " +
        "|distinct gap| cumulative table"),

    Q("q42_order_balance",
      (s, d) => {
        // Fact-fact reconciliation census: does o_totalprice equal the
        // order's line total (TPC-H's documented invariant)? The
        // synthetic data deliberately violates it (±7e7 cents) and has
        // 257 line-less orders at sf0.01 — exactly what a real audit
        // finds. Shape: lineitem reduces per order FIRST (combinable
        // exact cents), then ONE orderkey-shuffled left join against
        // orders, then a single-row census — nothing fact-sized
        // survives past the join.
        val li = Tables.lineitem(s, d)
          .select(col("l_orderkey"), expr(
            "cast(floor(l_extendedprice * (1.0 - l_discount)" +
              " * (1.0 + l_tax) * 100.0 + 0.5) as bigint)").as("c"))
          .groupBy("l_orderkey").agg(sum("c").as("lc"))
        Tables.orders(s, d)
          .select(col("o_orderkey"),
            expr("cast(floor(o_totalprice * 100.0 + 0.5) as bigint)")
              .as("oc"))
          .join(li, col("o_orderkey") === col("l_orderkey"), "left")
          .agg(count(lit(1)).as("n_orders"),
            sum(when(col("lc").isNull, 1L).otherwise(0L)).as("n_lineless"),
            sum(when(col("oc") === col("lc"), 1L).otherwise(0L)).as("n_exact"),
            sum(when(col("oc") > col("lc"), 1L).otherwise(0L)).as("n_over"),
            sum(when(col("oc") < col("lc"), 1L).otherwise(0L)).as("n_under"),
            sum(when(col("lc").isNotNull, abs(col("oc") - col("lc")))
              .otherwise(0L)).as("sad"),
            max(when(col("lc").isNotNull, abs(col("oc") - col("lc"))))
              .as("max_abs_delta_cents"))
          .select(col("n_orders"), col("n_lineless"), col("n_exact"),
            col("n_over"), col("n_under"),
            pround(col("sad").cast("double") /
              (col("n_orders") - col("n_lineless")).cast("double"), 6)
              .as("mean_abs_delta_cents"),
            col("max_abs_delta_cents"))
      },
      Some("""WITH li AS (
             |  SELECT l_orderkey,
             |         CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount)
             |               * (1.0 + l_tax) * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS lc
             |  FROM lineitem GROUP BY 1),
             |j AS (
             |  SELECT CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS oc, lc
             |  FROM orders LEFT JOIN li ON o_orderkey = l_orderkey)
             |SELECT count(*) AS n_orders,
             |       CAST(sum(CASE WHEN lc IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_lineless,
             |       CAST(sum(CASE WHEN oc = lc THEN 1 ELSE 0 END) AS BIGINT) AS n_exact,
             |       CAST(sum(CASE WHEN oc > lc THEN 1 ELSE 0 END) AS BIGINT) AS n_over,
             |       CAST(sum(CASE WHEN oc < lc THEN 1 ELSE 0 END) AS BIGINT) AS n_under,
             |       floor(CAST(sum(CASE WHEN lc IS NOT NULL THEN abs(oc - lc) ELSE 0 END) AS DOUBLE)
             |             / CAST(count(*) - sum(CASE WHEN lc IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
             |             * 1000000.0 + 0.5) / 1000000.0 AS mean_abs_delta_cents,
             |       max(CASE WHEN lc IS NOT NULL THEN abs(oc - lc) END) AS max_abs_delta_cents
             |FROM j""".stripMargin),
      doc = "order-vs-lines reconciliation census: lineitem reduces per " +
        "order before the single orderkey-shuffled left join; exact-cents " +
        "deltas, line-less orders surfaced, one census row out"),

    Q("q43_promo_suppliers",
      (s, d) => {
        // TPC-H Q20's shape without partsupp: which suppliers are
        // PROMO-concentrated — more than a quarter of their 1996
        // shipped value in PROMO-type parts (PROMO is 1 of 5 types, so
        // >25% means over-indexed vs the ~20% base rate)? Part type joins INTO the fact before the
        // supplier reduction (p_type is one pruned column; at warehouse
        // scale part is fact-sized so this is a partkey shuffle, never
        // a broadcast hint), then ONE conditional-sum reduction per
        // supplier, the share filter, and a bounded-output name join
        // against the supplier dim AFTER the reduce (q18's discipline:
        // dims join the reduced table, not the fact stream).
        val li = Tables.lineitem(s, d)
          .where(col("l_shipdate") >= lit("1996-01-01").cast("timestamp_ntz") &&
            col("l_shipdate") < lit("1997-01-01").cast("timestamp_ntz"))
          .select(col("l_suppkey"), col("l_partkey"),
            floor(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
              * 10000.0 + 0.5).cast(DecimalType(38, 0)).as("u"))
        val shares = li
          .join(Tables.part(s, d).select(col("p_partkey"), col("p_type")),
            col("l_partkey") === col("p_partkey"))
          .groupBy("l_suppkey")
          .agg(sum("u").as("total_u"),
            sum(when(col("p_type") === "PROMO", col("u")).otherwise(0))
              .as("promo_u"))
          .where(col("promo_u") * 4 > col("total_u"))
        shares
          .join(Tables.supplier(s, d).select("s_suppkey", "s_name"),
            col("l_suppkey") === col("s_suppkey"))
          .select(col("s_name"),
            (col("total_u").cast("double") / 10000.0).as("total_revenue"),
            pround(col("promo_u").cast("double") /
              col("total_u").cast("double"), 6).as("promo_share"))
          .orderBy(desc("promo_share"), col("s_name"))
      },
      Some("""WITH j AS (
             |  SELECT l_suppkey,
             |         CAST(floor(l_extendedprice * (1.0 - l_discount) * 10000.0 + 0.5) AS HUGEINT) AS u,
             |         p_type
             |  FROM lineitem JOIN part ON p_partkey = l_partkey
             |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
             |    AND l_shipdate < TIMESTAMP '1997-01-01'),
             |sh AS (
             |  SELECT l_suppkey, CAST(sum(u) AS HUGEINT) AS total_u,
             |         CAST(sum(CASE WHEN p_type = 'PROMO' THEN u ELSE 0 END) AS HUGEINT) AS promo_u
             |  FROM j GROUP BY 1)
             |SELECT s_name,
             |       CAST(total_u AS DOUBLE) / 10000.0 AS total_revenue,
             |       floor(CAST(promo_u AS DOUBLE) / CAST(total_u AS DOUBLE)
             |             * 1000000.0 + 0.5) / 1000000.0 AS promo_share
             |FROM sh JOIN supplier ON s_suppkey = l_suppkey
             |WHERE promo_u * 4 > total_u
             |ORDER BY promo_share DESC, s_name""".stripMargin),
      doc = "TPC-H Q20-style promo-concentrated suppliers: part type " +
        "joins the fact on partkey (no dim broadcast hint — part is " +
        "fact-sized at scale), one conditional-sum supplier reduction, " +
        "share filter, name join AFTER the reduce"),

    Q("q44_also_bought",
      (s, d) => {
        // Market-basket co-occurrence ("customers who bought X also
        // bought Y"): distinct items per order, then the in-order
        // id-ordered pair expansion reduced on the pair key. The pair
        // fan-out is quadratic in basket size — TPC-H baskets hold <= 7
        // parts, but real carts are unbounded, so a documented
        // per-order cap (row_number <= 64, id-ordered so the kept
        // subset is deterministic) bounds the worst basket at 2016
        // pairs. Since r19 the kernel is the session-shared BUCKETED
        // basket layout (sortedBy l_orderkey), so the self-join runs
        // with ZERO exchange below the pair aggregation; top-20 with a
        // full tiebreak lands on TakeOrderedAndProject — no global sort.
        val capped = sharedCappedBasket(s, d)
        capped.select(col("l_orderkey"), col("l_partkey").as("part_a"))
          .join(capped.select(col("l_orderkey"), col("l_partkey").as("part_b")),
            "l_orderkey")
          .where(col("part_a") < col("part_b"))
          .groupBy("part_a", "part_b")
          .agg(count(lit(1)).as("n_orders"))
          .orderBy(col("n_orders").desc, col("part_a"), col("part_b"))
          .limit(20)
      },
      Some("""WITH it AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
             |cap AS (
             |  SELECT l_orderkey, l_partkey FROM (
             |    SELECT l_orderkey, l_partkey,
             |           row_number() OVER (PARTITION BY l_orderkey
             |                              ORDER BY l_partkey) AS rn
             |    FROM it) x
             |  WHERE rn <= 64),
             |pr AS (
             |  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b
             |  FROM cap a JOIN cap b
             |    ON a.l_orderkey = b.l_orderkey
             |   AND a.l_partkey < b.l_partkey)
             |SELECT part_a, part_b, CAST(count(*) AS BIGINT) AS n_orders
             |FROM pr GROUP BY 1, 2
             |ORDER BY n_orders DESC, part_a, part_b
             |LIMIT 20""".stripMargin),
      doc = "also-bought pair mining: distinct items per order, " +
        "deterministic 64-item basket cap (quadratic fan-out guard), " +
        "pair-key reduction with map-side combine, top-20 via " +
        "TakeOrderedAndProject"),

    Q("q45_basket_lift",
      (s, d) => {
        // q44 ranks pairs by raw support, which just surfaces popular
        // items; lift = P(a,b)/(P(a)P(b)) normalizes away item
        // popularity — the association measure recommenders actually
        // rank by. The basket kernel is the session-shared bucketed
        // layout (r19: one write serves q44/q45/q47 AND this query's
        // three consumers — pair expansion, item frequencies, order
        // total — with the pair self-join exchange-free). A support floor
        // (>= 3 co-orders) keeps 1-count flukes from topping the
        // ranking; lift divides exact integer products only at the end,
        // so ordering agrees bit-for-bit with the oracle.
        val capped = sharedCappedBasket(s, d)
        val pairs = capped
          .select(col("l_orderkey"), col("l_partkey").as("part_a"))
          .join(capped.select(col("l_orderkey"), col("l_partkey").as("part_b")),
            "l_orderkey")
          .where(col("part_a") < col("part_b"))
          .groupBy("part_a", "part_b").agg(count(lit(1)).as("n_both"))
          .where(col("n_both") >= 3)
        val freq = capped.groupBy("l_partkey").agg(count(lit(1)).as("cnt"))
        val tot = capped.select("l_orderkey").distinct()
          .agg(count(lit(1)).as("n_orders"))
        pairs
          .join(freq.select(col("l_partkey").as("part_a"), col("cnt").as("ca")),
            "part_a")
          .join(freq.select(col("l_partkey").as("part_b"), col("cnt").as("cb")),
            "part_b")
          .crossJoin(broadcast(tot))
          .select(col("part_a"), col("part_b"), col("n_both"),
            pround(expr("cast(n_both * n_orders as double) / " +
              "cast(ca * cb as double)"), 6).as("lift"))
          .orderBy(col("lift").desc, col("part_a"), col("part_b"))
          .limit(15)
      },
      Some("""WITH it AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
             |cap AS (
             |  SELECT l_orderkey, l_partkey FROM (
             |    SELECT l_orderkey, l_partkey,
             |           row_number() OVER (PARTITION BY l_orderkey
             |                              ORDER BY l_partkey) AS rn
             |    FROM it) x
             |  WHERE rn <= 64),
             |pr AS (
             |  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
             |         CAST(count(*) AS BIGINT) AS n_both
             |  FROM cap a JOIN cap b
             |    ON a.l_orderkey = b.l_orderkey
             |   AND a.l_partkey < b.l_partkey
             |  GROUP BY 1, 2 HAVING count(*) >= 3),
             |fq AS (SELECT l_partkey, CAST(count(*) AS BIGINT) AS cnt
             |       FROM cap GROUP BY 1),
             |tt AS (SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders
             |       FROM cap)
             |SELECT part_a, part_b, n_both,
             |       floor(CAST(n_both * n_orders AS DOUBLE)
             |             / CAST(ca.cnt * cb.cnt AS DOUBLE)
             |             * 1000000.0 + 0.5) / 1000000.0 AS lift
             |FROM pr JOIN fq ca ON ca.l_partkey = part_a
             |        JOIN fq cb ON cb.l_partkey = part_b
             |        CROSS JOIN tt
             |ORDER BY lift DESC, part_a, part_b
             |LIMIT 15""".stripMargin),
      doc = "basket lift ranking (q44's popularity-normalized " +
        "companion): shared capped-basket kernel materialized once for " +
        "three consumers, support floor >= 3, exact integer products " +
        "divided only in the final projection, deterministic top-15"),

    Q("q46_incremental_agg",
      (s, d) => {
        // Incremental view maintenance, proven: a per-supplier revenue
        // aggregate maintained as MERGEABLE partial state. The
        // "warehouse state" (shipments before the 1996-01-01 cutover)
        // and the "new batch" (after) each reduce to (suppkey, sum,
        // count) partials; the merge is a second groupBy-sum over the
        // union — sums of sums, never a re-scan of history. The ORACLE
        // computes the aggregate directly over all rows, so the driver
        // compare IS the proof that merge(partials) == full recompute
        // (the x26 HLL-algebra read, for exact aggregates). At 100 TB
        // the state side is a stored table and only the delta scans.
        val cut = java.time.LocalDate.parse("1996-01-01").toEpochDay
        val li = Tables.lineitem(s, d).select(col("l_suppkey"),
          expr("cast(floor(l_extendedprice * (1 - l_discount) * 100.0 + 0.5) as bigint)")
            .as("cents"),
          expr("unix_timestamp(l_shipdate) div 86400").as("day"))
        def partial(df: DataFrame) = df.groupBy("l_suppkey")
          .agg(sum("cents").as("s"), count(lit(1)).as("c"))
        partial(li.where(col("day") < cut))
          .unionByName(partial(li.where(col("day") >= cut)))
          .groupBy("l_suppkey")
          .agg(sum("s").as("rev_cents"), sum("c").as("n_items"))
          .select(col("l_suppkey"), col("rev_cents"), col("n_items"),
            pround(col("rev_cents").cast("double")
              / col("n_items").cast("double"), 6).as("avg_cents"))
      },
      Some("""SELECT l_suppkey,
             |       CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS rev_cents,
             |       CAST(count(*) AS BIGINT) AS n_items,
             |       floor(CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100.0 + 0.5) AS BIGINT)) AS DOUBLE)
             |             / CAST(count(*) AS DOUBLE) * 1000000.0 + 0.5)
             |         / 1000000.0 AS avg_cents
             |FROM lineitem GROUP BY 1""".stripMargin),
      doc = "incremental aggregate maintenance, proven: state + delta " +
        "partials (pre/post a date cutover) merge by summing partial " +
        "sums/counts, and the oracle recomputes directly over all rows " +
        "— equality is the mergeability proof; exact cents, 6-dp mean"),

    Q("q47_next_purchase",
      (s, d) => {
        // Sequential pattern mining: "customers who bought A went on to
        // buy B in their NEXT order" — the temporal association q44/q45
        // (within-basket) cannot see; the training signal behind
        // next-purchase recommenders. Per customer, orders rank by
        // (date, orderkey) — ONE o_custkey window over the orders dim,
        // never the facts — and item pairs cross only CONSECUTIVE order
        // pairs, so per-customer fan-out is bounded by orders ×
        // basket² (baskets already capped by the shared q44 kernel).
        // Directional pairs (A then B ≠ B then A); top-20 by support
        // with a full tiebreak lands on TakeOrderedAndProject.
        val seq = Tables.orders(s, d)
          .select(col("o_custkey"), col("o_orderkey"),
            expr("unix_timestamp(o_orderdate) div 86400").as("day"))
          .withColumn("rnk", row_number().over(
            Window.partitionBy("o_custkey").orderBy(col("day"), col("o_orderkey"))))
        val items = sharedCappedBasket(s, d)
        val withSeq = Materialize.frame(
          items.join(seq, col("l_orderkey") === col("o_orderkey"))
            .select(col("o_custkey"), col("rnk"), col("l_partkey")))
        withSeq.select(col("o_custkey"), col("rnk"),
            col("l_partkey").as("part_from"))
          .join(withSeq.select(col("o_custkey"), (col("rnk") - 1).as("rnk"),
            col("l_partkey").as("part_to")), Seq("o_custkey", "rnk"))
          .groupBy("part_from", "part_to")
          .agg(count(lit(1)).as("n_transitions"))
          .orderBy(col("n_transitions").desc, col("part_from"), col("part_to"))
          .limit(20)
      },
      Some("""WITH sq AS (
             |  SELECT o_custkey, o_orderkey,
             |         row_number() OVER (PARTITION BY o_custkey
             |           ORDER BY CAST(floor(epoch(o_orderdate)) AS BIGINT) // 86400,
             |                    o_orderkey) AS rnk
             |  FROM orders),
             |it AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
             |cap AS (
             |  SELECT l_orderkey, l_partkey FROM (
             |    SELECT l_orderkey, l_partkey,
             |           row_number() OVER (PARTITION BY l_orderkey
             |                              ORDER BY l_partkey) AS rn
             |    FROM it) x
             |  WHERE rn <= 64),
             |ws AS (
             |  SELECT s.o_custkey, s.rnk, c.l_partkey
             |  FROM cap c JOIN sq s ON c.l_orderkey = s.o_orderkey)
             |SELECT a.l_partkey AS part_from, b.l_partkey AS part_to,
             |       CAST(count(*) AS BIGINT) AS n_transitions
             |FROM ws a JOIN ws b
             |  ON a.o_custkey = b.o_custkey AND b.rnk = a.rnk + 1
             |GROUP BY 1, 2
             |ORDER BY n_transitions DESC, part_from, part_to
             |LIMIT 20""".stripMargin),
      doc = "next-purchase sequential pairs (the temporal association " +
        "within-basket mining can't see): one o_custkey rank window " +
        "over the orders dim, consecutive-order equality join on " +
        "(custkey, rnk), shared capped-basket kernel, top-20 " +
        "TakeOrderedAndProject"),

    Q("q48_segment_migration",
      (s, d) => {
        // Customer lifecycle matrix: spend-quartile segment in the
        // first half of the calendar vs the second — who upgraded,
        // who churned (segment 0 = absent that half), who arrived. The
        // f11/rfm quartile discipline: per-period cut points come from
        // cumulative windows over |distinct spend value| tables (never
        // a |customers|-row global window), customers join their two
        // segments full-outer on custkey, and the matrix is a <=5x5
        // rollup.
        val o = Tables.orders(s, d).select(col("o_custkey"),
          expr("unix_timestamp(o_orderdate) div 86400").as("day"),
          expr("cast(floor(o_totalprice * 100.0 + 0.5) as bigint)").as("c"))
        val mm = o.agg(min("day").as("dmin"), max("day").as("dmax"))
        // EAGER (r19): the per-(half, customer) spend table feeds both
        // the cut-point windows and the segment join — customer-bounded,
        // stored once instead of re-running the fact shuffle per
        // consumer.
        val pc = Materialize.frame(o.crossJoin(broadcast(mm))
          .select((col("day") * 2 <= col("dmin") + col("dmax"))
            .cast("long").as("g"), col("o_custkey"), col("c"))
          .groupBy("g", "o_custkey").agg(sum("c").as("spend")))
        val cw = Window.partitionBy("g").orderBy("spend")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val cm = pc.groupBy("g", "spend").agg(count(lit(1)).as("cnt"))
          .select(col("g"), col("spend"), sum("cnt").over(cw).as("cum"),
            sum("cnt").over(Window.partitionBy("g")).as("n"))
        val sg = pc.join(cm, Seq("g", "spend"))
          .select(col("g"), col("o_custkey"),
            expr("(4 * cum + n - 1) div n").as("q"))
        val a = sg.where(col("g") === 1)
          .select(col("o_custkey"), col("q").as("qa"))
        val b = sg.where(col("g") === 0)
          .select(col("o_custkey"), col("q").as("qb"))
        a.join(b, Seq("o_custkey"), "full_outer")
          .groupBy(coalesce(col("qa"), lit(0L)).as("seg_a"),
            coalesce(col("qb"), lit(0L)).as("seg_b"))
          .agg(count(lit(1)).as("n_customers"))
          .orderBy("seg_a", "seg_b")
      },
      Some("""WITH o AS (
             |  SELECT o_custkey,
             |         CAST(floor(epoch(o_orderdate)) AS BIGINT) // 86400 AS day,
             |         CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS c
             |  FROM orders),
             |mm AS (SELECT min(day) AS dmin, max(day) AS dmax FROM o),
             |pc AS (SELECT CASE WHEN day * 2 <= dmin + dmax THEN 1 ELSE 0 END AS g,
             |              o_custkey, CAST(sum(c) AS BIGINT) AS spend
             |       FROM o CROSS JOIN mm GROUP BY 1, 2),
             |vm AS (SELECT g, spend, CAST(count(*) AS BIGINT) AS cnt
             |       FROM pc GROUP BY 1, 2),
             |cm AS (SELECT g, spend,
             |              sum(cnt) OVER (PARTITION BY g ORDER BY spend) AS cum,
             |              sum(cnt) OVER (PARTITION BY g) AS n
             |       FROM vm),
             |sg AS (SELECT pc.g, pc.o_custkey, (4 * cum + n - 1) // n AS q
             |       FROM pc JOIN cm ON pc.g = cm.g AND pc.spend = cm.spend),
             |a AS (SELECT o_custkey, q FROM sg WHERE g = 1),
             |b AS (SELECT o_custkey, q FROM sg WHERE g = 0)
             |SELECT CAST(coalesce(a.q, 0) AS BIGINT) AS seg_a,
             |       CAST(coalesce(b.q, 0) AS BIGINT) AS seg_b,
             |       CAST(count(*) AS BIGINT) AS n_customers
             |FROM a FULL OUTER JOIN b ON a.o_custkey = b.o_custkey
             |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),
      doc = "spend-quartile segment migration between calendar halves " +
        "(0 = absent): f11's value-table quartile discipline per " +
        "period, full-outer custkey join, <=5x5 matrix rollup — the " +
        "churn/upgrade lifecycle read"),

    Q("q49_group_ols",
      (s, d) => {
        // Per-segment discount sensitivity: within each return-flag
        // segment, the OLS slope of quantity on discount — x29's global
        // regression grouped (does the discount effect differ across
        // outcome segments?). Discounts quantize to exact basis points
        // and quantities to integers, so the moments reduce exactly with
        // map-side combine — the squared moments in DECIMAL(38,0) (a
        // BIGINT sum would wrap silently at warehouse row counts while
        // the oracle raises); the slope tree is one IEEE division per
        // group over |flags| rows.
        val dec = org.apache.spark.sql.types.DecimalType(38, 0)
        val li = Tables.lineitem(s, d).select(
          col("l_returnflag").as("flag"),
          expr("cast(floor(l_discount * 10000.0 + 0.5) as bigint)").as("x"),
          expr("cast(floor(l_quantity + 0.5) as bigint)").as("y"))
        li.groupBy("flag")
          .agg(count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"),
            sum((col("x") * col("x")).cast(dec)).as("sxx"),
            sum((col("x") * col("y")).cast(dec)).as("sxy"))
          .select(col("flag"), col("n").as("n_rows"),
            pround(expr("cast(sx as double) / cast(n as double)"), 6)
              .as("mean_disc_bp"),
            pround(expr(Relational.groupSlopeExpr), 9).as("slope_per_bp"))
          .orderBy("flag")
      },
      Some(s"""WITH m AS (
              |  SELECT l_returnflag AS flag,
              |         CAST(count(*) AS BIGINT) AS n,
              |         CAST(sum(CAST(floor(l_discount * 10000.0 + 0.5) AS BIGINT)) AS BIGINT) AS sx,
              |         CAST(sum(CAST(floor(l_quantity + 0.5) AS BIGINT)) AS BIGINT) AS sy,
              |         CAST(sum(CAST(floor(l_discount * 10000.0 + 0.5) AS BIGINT)
              |                  * CAST(floor(l_discount * 10000.0 + 0.5) AS BIGINT)) AS BIGINT) AS sxx,
              |         CAST(sum(CAST(floor(l_discount * 10000.0 + 0.5) AS BIGINT)
              |                  * CAST(floor(l_quantity + 0.5) AS BIGINT)) AS BIGINT) AS sxy
              |  FROM lineitem GROUP BY 1)
              |SELECT flag, n AS n_rows,
              |       floor(cast(sx as double) / cast(n as double)
              |             * 1000000.0 + 0.5) / 1000000.0 AS mean_disc_bp,
              |       floor((${Relational.groupSlopeExpr}) * 1000000000.0 + 0.5)
              |         / 1000000000.0 AS slope_per_bp
              |FROM m ORDER BY flag""".stripMargin),
      doc = "grouped OLS (x29 per return-flag segment): exact basis-" +
        "point/integer moments with map-side combine, one IEEE slope " +
        "division per group, constant-variance guard null, |flags| rows"),

    Q("q50_bucketed_revenue",
      (s, d) => graft.sources.Bucketing.bucketedOrderLineitemJoin(s, d)
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_items"),
          (sum(floor(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
              * 10000.0 + 0.5))
            .cast("double") / 10000.0).as("revenue"))
        .orderBy("o_orderpriority"),
      Some("""SELECT o_orderpriority,
             |       CAST(count(*) AS BIGINT) AS n_items,
             |       CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * 10000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 10000.0 AS revenue
             |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
             |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin),
      doc = "revenue per order priority over the session-shared BUCKETED " +
        "orders/lineitem layout (sources/Bucketing): the fact-fact join " +
        "is a SortMergeJoin whose children are one-file-per-bucket " +
        "bucket scans — ZERO Exchange below the join (pinned in " +
        "PlanAuditSpec); write-time bucketing is the last time the " +
        "order key is ever shuffled. The in-partition Sorts remain " +
        "(Spark 3+ stopped trusting written sort order by default — " +
        "spark.sql.legacy.bucketedTableScan.outputOrdering) but are " +
        "shuffle-free and linear over the already-sorted files. First " +
        "consumer per session pays the build (the shared-ladder " +
        "accounting); the q5 fixed-point revenue arithmetic"),
  )
}
