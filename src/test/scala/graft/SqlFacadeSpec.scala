package graft

class SqlFacadeSpec extends SparkSpec {
  import spark.implicits._

  test("registerAll exposes every table to spark.sql with proper types") {
    Tables.registerAll(spark, sf("sf0.001"))
    val n = spark.sql(
      """SELECT r_name, count(*) AS n FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin).count()
    assert(n === 5)
    // events.ts arrives as a usable timestamp (nanos conversion applied)
    val hours = spark.sql("SELECT DISTINCT hour(ts) FROM events").count()
    assert(hours >= 1)
    // fp_dot (session extension) is usable from SQL over embeddings
    val d = spark.sql(
      """SELECT fp_dot(
        |  transform(embedding, x -> cast(floor(cast(x as double) * 100000.0) as bigint)),
        |  transform(embedding, x -> cast(floor(cast(x as double) * 100000.0) as bigint))) AS nrm
        |FROM embeddings LIMIT 1""".stripMargin).as[Long].head()
    assert(d > 0L)
  }
}
