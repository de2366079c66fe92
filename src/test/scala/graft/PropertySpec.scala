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
