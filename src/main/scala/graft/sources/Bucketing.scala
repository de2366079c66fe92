package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table utilities: pre-shuffle data once at write time so
  * repeated joins/aggregations on the bucket key run with NO exchange.
  *
  * At 100 TB the dominant cost of a fact-fact join is the shuffle; two
  * tables bucketed by the same key into the same bucket count join
  * shuffle-free (Spark plans a SortMergeJoin whose children are already
  * distributed by the bucket key). This is the physical-design lever the
  * reference's HDFS layout never had; it pairs with `Skew.saltedJoin` for
  * hot keys and with AQE for everything in between.
  */
object Bucketing {

  /** Write `df` as a bucketed managed table (parquet, overwrite). */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int, sortCols: Seq[String] = Seq.empty): Unit = {
    val w = df.write.mode(SaveMode.Overwrite).format("parquet")
      .bucketBy(buckets, key)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .saveAsTable(table)
  }

  /** True when the physical plan of `df` contains no shuffle exchange —
    * the property bucketed joins are bought for. */
  def isExchangeFree(df: DataFrame): Boolean =
    !df.queryExecution.executedPlan.toString.contains("Exchange")

  /** Join two same-bucketed tables on the bucket key. */
  def bucketedJoin(spark: SparkSession, left: String, right: String,
      key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)
}
