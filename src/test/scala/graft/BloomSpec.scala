package graft

import org.apache.spark.sql.functions._

import operators.Bloom

class BloomSpec extends SparkSpec {
  import spark.implicits._

  test("bloom has NO false negatives: every true match passes") {
    val build = (1L to 200L).map(i => i * 3).toDF("key")
    val probe = (1L to 900L).toDF("key")
    val r = Bloom.prefilterStats(build, "key", probe, "key").collect().head
    val nTrue = r.getAs[Long]("n_true_match")
    val nPass = r.getAs[Long]("n_bloom_pass")
    assert(nTrue == 200L)
    assert(nPass >= nTrue, "a bloom filter must never drop a true match")
    assert(r.getAs[Long]("n_probe") == 900L)
  }

  test("false-positive rate is small for a lightly-loaded filter") {
    val r = Bloom.prefilterStats(
      Tables.orders(spark, sf("sf0.01")).where(col("o_orderstatus") === "F"),
      "o_orderkey",
      Tables.lineitem(spark, sf("sf0.01")), "l_orderkey").collect().head
    // ~15k positions in 65536 bits, k=3 -> expected fp ~ 1%; allow 5%
    assert(r.getAs[Double]("fp_rate") < 0.05,
      s"fp rate too high: $r")
  }

  test("bit positions stay within the filter width") {
    val bits = Bloom.buildBits((1L to 500L).toDF("key"), "key")
      .agg(min("pos"), max("pos")).collect().head
    assert(bits.getLong(0) >= 0L && bits.getLong(1) < Bloom.BloomBits)
  }
}
