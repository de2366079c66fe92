package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Q, Tables}

/** Skew-handling utilities for 100 TB shuffles.
  *
  * A hash-partitioned join or aggregation collapses when one key holds a
  * disproportionate share of rows (a hot user, an empty-string token, a
  * null join key): one task receives the whole key while the rest of the
  * cluster idles. Two standard remedies, both declarative:
  *
  *  - AQE skew-join splitting (`spark.sql.adaptive.skewJoin.enabled`,
  *    on by default) — handles sort-merge-join skew at runtime; prefer it
  *    when applicable and reach for salting only when AQE can't help
  *    (aggregations, or joins AQE doesn't rewrite).
  *  - Salting: spread each hot key over `saltBuckets` synthetic sub-keys,
  *    replicate the small side per bucket, aggregate in two phases.
  */
object Skew {

  /** Salted equi-join of a skewed large side against a small-ish right
    * side: the large side gets a random-but-deterministic salt derived
    * from a uniqueness column; the right side is exploded once per salt
    * bucket. Result equals a plain inner join on `key`. */
  def saltedJoin(large: DataFrame, right: DataFrame, key: String,
      uniqueCol: String, saltBuckets: Int): DataFrame = {
    val salted = large.withColumn("_salt",
      pmod(hash(col(uniqueCol)), lit(saltBuckets)))
    val replicated = right.withColumn("_salt",
      explode(expr(s"sequence(0, ${saltBuckets - 1})")))
    salted.join(replicated, Seq(key, "_salt")).drop("_salt")
  }

  /** Two-phase (salted) aggregation: count per (key, salt) partially,
    * then combine per key — caps any single task's share of a hot key at
    * 1/saltBuckets. (Catalyst's partial aggregation already does this for
    * algebraic aggregates; the explicit form is for aggregations where
    * the partial step must be keyed, e.g. distinct-heavy pipelines.) */
  def saltedCount(df: DataFrame, key: String, uniqueCol: String,
      saltBuckets: Int): DataFrame =
    df.withColumn("_salt", pmod(hash(col(uniqueCol)), lit(saltBuckets)))
      .groupBy(col(key), col("_salt"))
      .agg(count(lit(1)).as("_partial"))
      .groupBy(col(key))
      .agg(sum(col("_partial")).as("cnt"))
}

/** Oracle-gated skew queries: salting changes the SHUFFLE LAYOUT, never
  * the answer, so both oracles are the plain unsalted SQL — the compare
  * proves the rewrite is semantically invisible. */
object SkewQueries {
  import Skew._

  val qs: Seq[Q] = Seq(
    Q("x14_salted_count",
      (s, d) => saltedCount(Tables.events(s, d), "event_type", "event_id", 32)
        .orderBy("event_type"),
      Some("""SELECT event_type, count(*) AS cnt
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin),
      doc = "two-phase salted aggregation over a hot key: count per " +
        "(key, salt) partially, combine per key - caps any task's share " +
        "of a hot key at 1/32; oracle is the plain GROUP BY, proving " +
        "salting is answer-invisible"),

    Q("x15_salted_join",
      (s, d) => {
        // the 5-row event_type dim joined against the skewed fact WITHOUT
        // a broadcast: salting spreads each hot key over 16 sub-keys so a
        // shuffle join's per-task share of any key is capped at 1/16 —
        // the remedy when the build side is too big to broadcast AND one
        // key dominates (AQE skew-join handles sort-merge joins; the
        // explicit form also covers aggregations and bucketed layouts).
        // value sums in fixed-point LONG micros (q15's integer-adds
        // discipline; per-type sums stay far below 2^53)
        val dim = Tables.events(s, d)
          .groupBy("event_type")
          .agg(count(lit(1)).as("type_n"))
        saltedJoin(Tables.events(s, d), dim, "event_type",
            "event_id", 16)
          .groupBy("event_type")
          .agg(min(col("type_n")).as("type_n"),
            (sum(floor(col("value") * 1000000.0 + 0.5))
              .cast("double") / 1000000.0).as("sum_value"))
          .orderBy("event_type")
      },
      Some("""WITH dim AS (
             |  SELECT event_type, count(*) AS type_n FROM events GROUP BY event_type)
             |SELECT e.event_type, min(dim.type_n) AS type_n,
             |       CAST(sum(CAST(floor(e.value * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000.0 AS sum_value
             |FROM events e JOIN dim ON e.event_type = dim.event_type
             |GROUP BY e.event_type ORDER BY e.event_type""".stripMargin),
      doc = "salted equi-join of a skewed fact against a derived dim: " +
        "the hot key is spread over 16 salt buckets, the dim replicated " +
        "per bucket; oracle is the plain join + GROUP BY"),
  )
}
