package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * All operators take the scale-factor directory as a parameter so the same
  * plan runs at sf0.001 (smoke), sf0.01 (oracle) and sf0.1+ (bench). At
  * cluster scale the same code reads a 100 TB table: parquet scans get
  * column pruning + predicate pushdown from Catalyst for free, so every
  * downstream operator should select only the columns it needs.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    // Testdata timestamps are parquet TIMESTAMP(NANOS), which the Spark
    // reader rejects; read them as raw nano longs (converted per-table
    // below with exact integer division).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$dir/$name.parquet")
  }

  /** Nano-long → naive micro timestamp (TIMESTAMP_NTZ, so parquet sinks
    * write isAdjustedToUTC=false and DuckDB sees identical wall times).
    * Micro-precision columns already load as TIMESTAMP_NTZ and are left
    * alone — only NANOS columns surface as LongType under nanosAsLong. */
  private def nanosToTs(df: DataFrame, cols: String*): DataFrame =
    cols.foldLeft(df) { (d, c) =>
      if (d.schema(c).dataType == org.apache.spark.sql.types.LongType)
        // convert_timezone pins the NTZ wall time to the UTC rendering of
        // the instant regardless of spark.sql.session.timeZone (a bare
        // cast to timestamp_ntz renders in the session zone, silently
        // shifting wall times for non-UTC sessions)
        d.withColumn(c, expr(
          s"convert_timezone(current_timezone(), 'UTC', " +
            s"cast(timestamp_micros($c div 1000) as timestamp_ntz))"))
      else d
    }

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame =
    nanosToTs(table(s, d, "orders"), "o_orderdate")
  def lineitem(s: SparkSession, d: String): DataFrame =
    nanosToTs(table(s, d, "lineitem"), "l_shipdate")
  def events(s: SparkSession, d: String): DataFrame =
    nanosToTs(table(s, d, "events"), "ts")

  val names: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  /** Register every testdata table as a temp view so ad-hoc
    * `spark.sql(...)` works against the same loaders (timestamp handling
    * included). */
  def registerAll(s: SparkSession, d: String): Unit = Seq(
    "region" -> region _, "nation" -> nation _, "customer" -> customer _,
    "supplier" -> supplier _, "part" -> part _, "orders" -> orders _,
    "lineitem" -> lineitem _, "events" -> events _,
    "documents" -> documents _, "embeddings" -> embeddings _)
    .foreach { case (n, f) => f(s, d).createOrReplaceTempView(n) }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
