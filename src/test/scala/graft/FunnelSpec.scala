package graft

import java.sql.Timestamp

import operators.Funnel

class FunnelSpec extends SparkSpec {
  import spark.implicits._

  private def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")

  // (event_id, ts, user_id, event_type)
  private def ev(rows: (Long, Int, Long, String)*) =
    rows.map { case (e, m, u, t) => (e, ts(m), u, t) }
      .toDF("event_id", "ts", "user_id", "event_type")

  test("transitions count adjacent pairs per user, ordered by time") {
    val df = ev((1, 1, 1, "view"), (2, 2, 1, "click"), (3, 3, 1, "purchase"),
      (4, 1, 2, "view"), (5, 2, 2, "click"))
    val t = Funnel.eventTransitions(df).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(t == Map(("view", "click") -> 2L, ("click", "purchase") -> 1L))
  }

  test("funnel is strictly sequential: a purchase BEFORE the click does not convert") {
    val df = ev(
      // user 1: view -> click -> purchase (converts fully)
      (1, 1, 1, "view"), (2, 2, 1, "click"), (3, 3, 1, "purchase"),
      // user 2: purchase happens before the click — stage 3 must not count
      (4, 1, 2, "view"), (5, 3, 2, "click"), (6, 2, 2, "purchase"),
      // user 3: click with no prior view — stages 2 and 3 must not count
      (7, 1, 3, "click"), (8, 2, 3, "purchase"))
    val r = Funnel.funnelConversion(df).collect().head
    assert(r.getAs[Long]("n_users") == 3L)
    assert(r.getAs[Long]("n_view") == 2L)
    assert(r.getAs[Long]("n_click_after_view") == 2L)
    assert(r.getAs[Long]("n_purchase_funnel") == 1L)
  }

  test("funnel stages are monotonically non-increasing on real data") {
    val r = Funnel.funnelConversion(Tables.events(spark, sf("sf0.01")))
      .collect().head
    val (u, v, c, p) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(u >= v && v >= c && c >= p, s"funnel not monotone: $u $v $c $p")
    assert(p > 0, "sf0.01 should have at least one full conversion")
  }
}
