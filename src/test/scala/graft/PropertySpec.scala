package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.plans.StageAggregator
import graft.plans.StageAggregator.ProgressEvent

/** Property tests (SURVEY §5): invariants that must hold for ANY input,
  * not just fixtures. Uses seeded scalacheck generators directly (the
  * scalatest-scalacheck bridge isn't in the offline cache). */
class PropertySpec extends SparkSpec {

  private def forAllSamples[A](g: Gen[A], n: Int = 50)(f: A => Unit): Unit =
    (0 until n).foreach { i =>
      g.apply(Gen.Parameters.default, Seed(42L + i)).foreach(f)
    }

  private val eventGen = for {
    t <- Gen.choose(0L, 10000L)
    m <- Gen.choose(0, 100)
    r <- Gen.choose(0, 100)
  } yield (t, m, r)

  test("stage times: durations non-negative, overlap in [0,100], total >= map") {
    forAllSamples(Gen.nonEmptyListOf(eventGen)) { evs =>
      val buf = evs.map { case (t, m, r) => ProgressEvent("r", t, m, r) }
        .foldLeft(StageAggregator.agg.zero)(StageAggregator.agg.reduce)
      val st = StageAggregator.agg.finish(buf)
      assert(st.totalS >= 0.0 && st.mapS >= 0.0 && st.reduceS >= 0.0)
      // NOTE: shuffleS has no non-negativity invariant — the reference's
      // 2nd-from-end fallback (common_utils.py:112-119, copied as-is per
      // SURVEY §7 risk 4) can end the shuffle before its detected start
      // for pathological event orders; parity beats sanity here.
      assert(st.overlapPct >= 0.0 && st.overlapPct <= 100.0)
      assert(st.totalS >= st.mapS)
    }
  }

  test("aggregator merge is commutative and agrees with sequential reduce") {
    forAllSamples(Gen.zip(Gen.nonEmptyListOf(eventGen), Gen.nonEmptyListOf(eventGen))) { case (l, r) =>
      val a = l.map { case (t, m, x) => ProgressEvent("r", t, m, x) }
        .foldLeft(StageAggregator.agg.zero)(StageAggregator.agg.reduce)
      val b = r.map { case (t, m, x) => ProgressEvent("r", t, m, x) }
        .foldLeft(StageAggregator.agg.zero)(StageAggregator.agg.reduce)
      val merged = StageAggregator.agg.finish(StageAggregator.agg.merge(a, b))
      val mergedRev = StageAggregator.agg.finish(StageAggregator.agg.merge(b, a))
      val seq = (l ++ r).map { case (t, m, x) => ProgressEvent("r", t, m, x) }
        .foldLeft(StageAggregator.agg.zero)(StageAggregator.agg.reduce)
      assert(merged === mergedRev)
      assert(merged === StageAggregator.agg.finish(seq))
    }
  }

  test("affine permutations are injective mod P and distinct across bands") {
    import operators.Dedup.{MinhashP, affinePerm}
    // (2j+1) is odd and < P (prime), so h -> (2j+1)h + off is a bijection
    // on [0, P): distinct inputs mod P must map to distinct outputs
    def evalPerm(j: Int, h: Long): Long = {
      val a = 2L * j + 1
      val off = (j.toLong * operators.Dedup.MinhashMixer) % MinhashP
      (a * (h % MinhashP) + off) % MinhashP
    }
    forAllSamples(Gen.zip(Gen.choose(0L, MinhashP - 1), Gen.choose(0L, MinhashP - 1)), n = 200) {
      case (h1, h2) =>
        (0 until 4).foreach { j =>
          if (h1 != h2) assert(evalPerm(j, h1) !== evalPerm(j, h2))
          assert(evalPerm(j, h1) >= 0 && evalPerm(j, h1) < MinhashP)
        }
    }
    // the Scala evaluation must agree with the SQL fragment both engines run
    import spark.implicits._
    val hs = Seq(0L, 1L, MinhashP - 1, 123456789L, (1L << 56) - 1).toDF("h")
    (0 until 4).foreach { j =>
      val sql = hs.selectExpr(s"h", s"${affinePerm(j, "h")} as p")
        .as[(Long, Long)].collect().toMap
      sql.foreach { case (h, p) => assert(p === evalPerm(j, h)) }
    }
  }

  test("replicateDocs mints globally unique doc_ids at any factor") {
    import spark.implicits._
    val docs = Seq((0L, "a", "en", "s", 1L), (1L, "b", "en", "s", 1L),
      (7L, "c", "de", "s", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    Seq(1, 3, 20).foreach { f =>
      val ids = ScaleDemo.replicateDocs(docs, f).select("doc_id")
        .as[Long].collect()
      assert(ids.length === 3 * f)
      assert(ids.distinct.length === ids.length, s"factor $f: id collision")
    }
  }

  test("wordCount conserves tokens for arbitrary ascii text") {
    import spark.implicits._
    val textGen = Gen.listOf(Gen.oneOf(
      Gen.alphaNumStr.map(_.take(8)), Gen.const(" "), Gen.const("\t")))
      .map(_.mkString)
    forAllSamples(Gen.nonEmptyListOf(textGen), n = 8) { texts =>
      val df = texts.toDF("text")
      val totals = operators.WordCount.tokenTotals(df)
        .collect()(0)
      val expected = texts.flatMap(_.split("[ \t\n\r\f]+")).count(_.nonEmpty)
      assert((if (totals.isNullAt(0)) 0L else totals.getLong(0)) === expected.toLong)
    }
  }
}
