package graft

/** The driver's own smoke checks, run as specs so a contract break
  * fails the suite before the driver ever sees it. */
class DriverContractSpec extends SparkSpec {

  test("entry() returns rows on sf0.001 (the driver's smoke check)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracleSql key has a queries entry (contract invariant)") {
    val qs = SparkEntry.queries.keySet
    val orphans = SparkEntry.oracleSql.keySet -- qs
    assert(orphans.isEmpty, s"oracleSql without queries: $orphans")
  }

  test("query names are unique across all modules") {
    val names = Registry.all.map(_.name)
    val dupes = names.groupBy(identity).filter(_._2.size > 1).keys
    assert(dupes.isEmpty, s"duplicate query names: $dupes")
  }

  test("every registered query runs and matches its column contract on sf0.001") {
    // columns referenced in the oracle must exist in the Spark result —
    // the driver's compare sorts columns BY NAME, so a rename on one
    // side is a silent hash mismatch; catch the cheap half here by
    // executing every plan once at the smallest SF
    Registry.all.foreach { q =>
      val df = q.run(spark, sf("sf0.001"))
      assert(df.columns.nonEmpty, s"${q.name}: no columns")
      df.limit(1).collect() // forces analysis + execution of every plan
    }
  }
}
