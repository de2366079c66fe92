package graft

import org.apache.spark.sql.functions._

/** Partition-layout + pruning: the other physical-design lever besides
  * bucketing. A 100 TB events table partitioned by event_type (or date)
  * lets a type-filtered query read only its directories — verified here
  * via PartitionFilters in the scan and the pruned file count. */
class PartitionPruningSpec extends SparkSpec {
  import spark.implicits._

  test("partitionBy write + filtered read scans only matching partitions") {
    val out = java.nio.file.Files.createTempDirectory("part").toString + "/events"
    Tables.events(spark, sf("sf0.001"))
      .write.mode("overwrite").partitionBy("event_type").parquet(out)

    val filtered = spark.read.parquet(out)
      .where(col("event_type") === "purchase")
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(event_type"),
      plan.take(1500))

    // row parity with the unpartitioned source
    val expected = Tables.events(spark, sf("sf0.001"))
      .where(col("event_type") === "purchase").count()
    assert(filtered.count() === expected)

    // only the purchase directory's files are scanned
    val scanned = filtered.queryExecution.executedPlan.collectLeaves()
      .head.toString
    assert(!scanned.contains("event_type=click"))
  }

  test("approximate cardinality (HLL) tracks exact distinct within 5%") {
    val docs = Tables.documents(spark, sf("sf0.01"))
    val (approx, exact) = docs
      .select(explode(split(col("text"), "[ \\t\\n\\r\\f]+")).as("w"))
      .where(length(col("w")) > 0)
      .agg(approx_count_distinct(col("w")).as("a"),
        countDistinct(col("w")).as("e"))
      .as[(Long, Long)].head()
    assert(math.abs(approx - exact).toDouble / exact < 0.05,
      s"approx=$approx exact=$exact")
  }
}
