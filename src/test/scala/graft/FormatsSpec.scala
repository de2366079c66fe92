package graft

import org.apache.spark.sql.functions._
import graft.operators.WordCount

/** Source/sink format coverage beyond parquet+text: the same operators
  * must produce identical results regardless of the storage format the
  * corpus arrives in (ORC, JSON-lines, CSV). */
class FormatsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Tables.documents(spark, sf("sf0.001"))
  private lazy val golden = WordCount.wordCount(docs).orderBy("word")
    .as[(String, Long)].collect().toList

  test("ORC round-trip: identical wordcount from an ORC copy") {
    val dir = java.nio.file.Files.createTempDirectory("orc").toString + "/docs"
    docs.write.mode("overwrite").orc(dir)
    val got = WordCount.wordCount(spark.read.orc(dir)).orderBy("word")
      .as[(String, Long)].collect().toList
    assert(got === golden)
  }

  test("JSON-lines round-trip with explicit schema") {
    val dir = java.nio.file.Files.createTempDirectory("jsonl").toString + "/docs"
    docs.write.mode("overwrite").json(dir)
    val got = WordCount.wordCount(
      spark.read.schema(docs.schema).json(dir)).orderBy("word")
      .as[(String, Long)].collect().toList
    assert(got === golden)
  }

  test("CSV round-trip with quoting survives embedded delimiters") {
    val dir = java.nio.file.Files.createTempDirectory("csv").toString + "/docs"
    docs.write.mode("overwrite").option("header", "true").csv(dir)
    val got = WordCount.wordCount(
      spark.read.option("header", "true").schema(docs.schema).csv(dir))
      .orderBy("word").as[(String, Long)].collect().toList
    assert(got === golden)
  }
}
