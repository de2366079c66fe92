package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

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
