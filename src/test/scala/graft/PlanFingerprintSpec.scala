package graft

import java.nio.file.{Files, Paths}

/** The exhaustive plan gate: every registered query's normalized
  * executedPlan hash must match the committed golden
  * (PLAN_FINGERPRINTS.json). A mismatch means the physical plan
  * changed — review it, and if intentional regenerate with
  *   GRAFT_WRITE_FINGERPRINTS=1 sbt "testOnly graft.PlanFingerprintSpec"
  * and commit the golden-file diff. See [[graft.Fingerprints]]. */
class PlanFingerprintSpec extends SparkSpec {

  test("all registered query plans match the committed fingerprints") {
    val fps = Fingerprints.compute(spark, sf("sf0.001"))
    // full normalized text for debugging drift (not committed)
    Files.createDirectories(Paths.get("target"))
    Files.writeString(Paths.get("target/plan_fingerprints_full.txt"),
      fps.map(f => s"===== ${f._1}\n${Fingerprints.skeleton(f._3)}\n")
        .mkString)
    val goldenPath = Paths.get(Fingerprints.GoldenPath)
    if (sys.env.get("GRAFT_WRITE_FINGERPRINTS").contains("1")) {
      Files.writeString(goldenPath,
        Fingerprints.render(fps.map(f => (f._1, f._2))))
      info(s"wrote ${fps.size} fingerprints to ${Fingerprints.GoldenPath}")
    } else {
      assert(Files.exists(goldenPath),
        s"${Fingerprints.GoldenPath} missing — regenerate (see scaladoc)")
      val golden = Fingerprints.parse(Files.readString(goldenPath))
      val missing = fps.map(_._1).filterNot(golden.contains)
      val stale = golden.keySet -- fps.map(_._1).toSet
      val changed = fps.filter { case (n, h, _) =>
        golden.get(n).exists(_ != h)
      }
      val report = changed.map { case (n, _, plan) =>
        s"== $n ==\n${Fingerprints.skeleton(plan).take(1500)}"
      }.mkString("\n\n")
      assert(missing.isEmpty && stale.isEmpty && changed.isEmpty,
        s"plan fingerprints drifted — review, then regenerate if intended\n" +
          s"new queries without golden: $missing\n" +
          s"golden entries without query: $stale\n" +
          s"changed plans: ${changed.map(_._1)}\n$report")
    }
  }
}
