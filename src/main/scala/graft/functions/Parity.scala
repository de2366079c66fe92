package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Cross-engine numeric parity helpers.
  *
  * The driver hash-compares Spark results against DuckDB, so every double
  * that reaches an output column must be *bit-identical* across engines.
  * Two failure modes and their fixes:
  *
  *  1. Float addition is not associative and Spark's partial-aggregation
  *     order is non-deterministic → never `sum`/`avg` raw doubles into an
  *     output. Quantize to a decimal grid first (exact, order-free), or
  *     sum longs.
  *  2. `round()` semantics differ: Spark rounds the shortest decimal
  *     string repr (BigDecimal HALF_UP on Double.toString), DuckDB rounds
  *     the binary value — 70.49125 (binary 70.4912499…) → 70.4913 vs
  *     70.4912. `pround` is floor(x·10^k + 0.5)/10^k, pure IEEE ops,
  *     identical everywhere.
  *
  * These helpers are also the 100 TB-safe shapes: decimal sums get
  * map-side partial aggregation exactly like double sums, and pround is a
  * codegen'd arithmetic projection.
  */
object Parity {

  /** Portable k-dp rounding. SQL mirror: floor(x * 1e{k} + 0.5) / 1e{k}. */
  def pround(c: Column, k: Int): Column = {
    val f = math.pow(10, k)
    floor(c * f + 0.5) / f
  }

  /** Exact order-independent sum of doubles: quantize to 6-dp, sum as
    * decimal, return double. SQL mirror:
    * CAST(sum(CAST(floor(x*1000000.0+0.5)/1000000.0 AS DECIMAL(28,6))) AS DOUBLE). */
  def exactSum(c: Column): Column =
    sum(pround(c, 6).cast(DecimalType(28, 6))).cast("double")

  /** Exact-parity mean: exactSum / count. */
  def exactAvg(c: Column): Column = exactSum(c) / count(lit(1))

  /** SQL-side mirrors, for building oracle strings consistently. */
  def proundSql(x: String, k: Int): String = {
    val f = "1" + ("0" * k) + ".0"
    s"floor($x * $f + 0.5) / $f"
  }
  def exactSumSql(x: String): String =
    s"CAST(sum(CAST(${proundSql(x, 6)} AS DECIMAL(28,6))) AS DOUBLE)"
  def exactAvgSql(x: String): String = s"${exactSumSql(x)} / count(*)"
}
