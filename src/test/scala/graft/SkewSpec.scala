package graft

import org.apache.spark.sql.functions._
import graft.operators.Skew

class SkewSpec extends SparkSpec {
  import spark.implicits._

  // heavily skewed: 90% of rows share one key
  private val large = (1 to 1000).map(i =>
    (if (i <= 900) "hot" else s"k${i % 7}", i.toLong)).toDF("key", "id")
  private val dim = Seq(("hot", "H"), ("k1", "A"), ("k2", "B"), ("k3", "C"),
    ("k4", "D"), ("k5", "E"), ("k6", "F"), ("k0", "G")).toDF("key", "attr")

  test("saltedJoin equals the plain join") {
    val plain = large.join(dim, "key").select("key", "id", "attr")
      .as[(String, Long, String)].collect().toSet
    val salted = Skew.saltedJoin(large, dim, "key", "id", 8)
      .select("key", "id", "attr").as[(String, Long, String)].collect().toSet
    assert(salted === plain)
    assert(salted.size === 1000)
  }

  test("saltedCount equals plain groupBy count") {
    val plain = large.groupBy("key").agg(count(lit(1)).as("cnt"))
      .as[(String, Long)].collect().toSet
    val salted = Skew.saltedCount(large, "key", "id", 8)
      .as[(String, Long)].collect().toSet
    assert(salted === plain)
  }

  test("salt actually spreads the hot key over multiple buckets") {
    val buckets = large.where(col("key") === "hot")
      .select(pmod(hash(col("id")), lit(8)).as("b"))
      .distinct().count()
    assert(buckets > 4)
  }
}
