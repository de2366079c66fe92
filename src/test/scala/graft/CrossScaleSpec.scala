package graft

import java.nio.file.{Files, Paths}
import scala.sys.process._

/** Cross-scale invariant gate (VERDICT r13 item 5): gen_sf1's copy 0 is
  * byte-identical to its source (every jitter is guarded on `i > 0`),
  * so a scaled dir is a STRICT SUPERSET of its base — filtering the
  * scaled tables back to base keys and re-running a query must
  * reproduce the base result bit-for-bit. That catches two classes the
  * per-scale oracles can't: generator regressions (the r12 copy-0
  * jitter bug) and scale/layout-dependent plan bugs (order-dependent
  * float aggregation, partitioning leaks — the filtered dir has a
  * different file layout, so any split-order sensitivity shows).
  *
  * Runs the REAL generator (tools/gen_sf1.py, the exact script that
  * builds /tmp/sf1) at sf0.001→10x so the gate is cheap enough for
  * every `sbt test`; the factor and base are the generator's only
  * parameters, so the code path proven here is the sf1 one. */
class CrossScaleSpec extends SparkSpec {

  private val ScaledDir = "/tmp/graft_crossscale_10x"
  private val Copy0Dir = "/tmp/graft_crossscale_copy0"

  /** table -> the key column whose copy-i values are offset past the
    * base range (gen_sf1.py key scheme), so a base-key semi-join
    * selects exactly copy 0 */
  private val TableKeys = Seq(
    "region" -> "r_regionkey", "nation" -> "n_nationkey",
    "customer" -> "c_custkey", "supplier" -> "s_suppkey",
    "part" -> "p_partkey", "orders" -> "o_orderkey",
    "lineitem" -> "l_orderkey", "events" -> "user_id",
    "documents" -> "doc_id", "embeddings" -> "vec_id")

  private lazy val copy0Ready: Unit = {
    val base = sf("sf0.001")
    // Cache keyed on the GENERATOR's content hash (ADVICE r14): a
    // presence-only check kept validating stale output of an old
    // gen_sf1.py after the script changed — defeating the gate's whole
    // purpose of catching generator regressions.
    val genHash = java.security.MessageDigest.getInstance("MD5")
      .digest(Files.readAllBytes(Paths.get("tools/gen_sf1.py")))
      .map("%02x".format(_)).mkString
    val stamp = Paths.get(s"$ScaledDir/.gen_sf1.md5")
    val fresh = Files.exists(Paths.get(s"$ScaledDir/embeddings.parquet")) &&
      Files.exists(stamp) &&
      new String(Files.readAllBytes(stamp), "UTF-8") == genHash
    if (!fresh) {
      val rc = Seq("python3", "tools/gen_sf1.py", base, ScaledDir, "10").!
      assert(rc == 0, "tools/gen_sf1.py failed")
      Files.write(stamp, genHash.getBytes("UTF-8"))
    }
    TableKeys.foreach { case (t, k) =>
      val baseKeys = spark.read.parquet(s"$base/$t.parquet")
        .select(k).distinct()
      spark.read.parquet(s"$ScaledDir/$t.parquet")
        .join(baseKeys, Seq(k), "semi")
        .write.mode("overwrite").parquet(s"$Copy0Dir/$t.parquet")
    }
  }

  test("scaled tables filtered to base keys have exactly the base row counts") {
    copy0Ready
    TableKeys.foreach { case (t, _) =>
      val nBase = spark.read.parquet(s"${sf("sf0.001")}/$t.parquet").count()
      val nCopy0 = spark.read.parquet(s"$Copy0Dir/$t.parquet").count()
      assert(nCopy0 === nBase, t)
    }
  }

  test("w1/g1/y4/x25 are bit-identical on base vs scaled-filtered-to-copy-0") {
    copy0Ready
    // scale-sensitive picks: corpus census (w1), exact dedup (g1),
    // threshold join through the shared shingle ladder (y4), and a
    // fixed-point economic aggregate over events (x25)
    Seq("w1_wordcount", "g1_exact_dedup", "y4_jaccard_threshold",
        "x25_gini").foreach { n =>
      val q = Registry.all.find(_.name == n)
        .getOrElse(fail(s"unknown query $n"))
      val a = q.run(spark, sf("sf0.001")).collect().toSeq
      val b = q.run(spark, Copy0Dir).collect().toSeq
      assert(a === b, s"$n: base vs copy-0 results differ")
    }
  }
}
