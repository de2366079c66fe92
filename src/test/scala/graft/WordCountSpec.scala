package graft

import org.apache.spark.sql.functions._
import graft.operators.WordCount

class WordCountSpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    "the quick brown fox",
    "  the\tlazy  dog ",          // leading/multiple whitespace, tab
    "the the the",
    "",                            // empty line → no tokens
    "fox").toDF("text")

  test("wordCount matches hand-counted golden (StringTokenizer semantics)") {
    val got = WordCount.wordCount(corpus).orderBy("word")
      .as[(String, Long)].collect().toList
    assert(got === List("brown" -> 1L, "dog" -> 1L, "fox" -> 2L,
      "lazy" -> 1L, "quick" -> 1L, "the" -> 5L))
  }

  test("no empty tokens from leading whitespace or empty lines") {
    val words = WordCount.wordCount(corpus).select("word").as[String].collect()
    assert(words.forall(_.nonEmpty))
  }

  test("token conservation: sum(cnt) == total token count (W2 vs W7)") {
    val docs = Tables.documents(spark, sf("sf0.001"))
    val total = WordCount.tokenTotals(docs).select("total_tokens").as[Long].head()
    val direct = docs.select(explode(split(col("text"),
      WordCount.WhitespaceRe)).as("w"))
      .where(length(col("w")) > 0).count()
    assert(total === direct)
  }

  test("topWords is a prefix of the full ordering with deterministic ties") {
    val top = WordCount.topWords(corpus, 3).as[(String, Long)].collect().toList
    assert(top === List("the" -> 5L, "fox" -> 2L, "brown" -> 1L))
  }

  test("writeTsv emits raw word<TAB>count lines, overwrite-idempotent (W8/W9)") {
    val dir = java.nio.file.Files.createTempDirectory("wc_tsv").toString + "/out"
    WordCount.writeTsv(WordCount.wordCount(corpus), dir)
    WordCount.writeTsv(WordCount.wordCount(corpus), dir) // W9: overwrite
    val lines = spark.read.text(dir).as[String].collect().sorted
    assert(lines.contains("the\t5"))
    assert(lines.length === 6)
  }
}
