package graft

import org.apache.spark.sql.functions._

import operators.{Dedup, Pipeline}

class PipelineSpec extends SparkSpec {

  test("census conserves rows: kept groups' docs = survivors + removed dups") {
    val docs = Tables.documents(spark, sf("sf0.01"))
    val result = Pipeline.curate(docs, 20)
    val got = result.agg(
      sum("n_docs").as("n"), sum("dups_removed").as("d")).collect().head
    // independent recomputation of the kept groups' total membership
    val expected = docs
      .select(Dedup.normText(col("text")).as("norm"),
        expr(s"cast(size(${Dedup.tokensExpr}) as bigint)").as("n_toks"))
      .groupBy("norm")
      .agg(count(lit(1)).as("sz"), min("n_toks").as("nt"))
      .where(col("nt") >= 20)
      .agg(sum("sz")).collect().head.getLong(0)
    assert(got.getLong(0) + got.getLong(1) == expected,
      s"survivors ${got.getLong(0)} + dups ${got.getLong(1)} != members $expected")
  }

  test("quality bar filters: no kept group is below the token minimum") {
    val docs = Tables.documents(spark, sf("sf0.001"))
    // with an impossible bar the census must be empty
    assert(Pipeline.curate(docs, 1000000).count() == 0)
    // with no bar, every doc lands in exactly one split/lang cell
    val all = Pipeline.curate(docs, 0)
    val covered = all.agg(sum("n_docs") + sum("dups_removed"))
      .collect().head.getLong(0)
    assert(covered == docs.count())
  }
}
