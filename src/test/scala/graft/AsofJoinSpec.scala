package graft

import org.apache.spark.sql.functions._
import graft.operators.AsofJoin

class AsofJoinSpec extends SparkSuite {
  import spark.implicits._

  lazy val trades = Seq(
    ("A", 100L, 1L), ("A", 205L, 2L), ("B", 50L, 3L), ("B", 300L, 4L), ("C", 10L, 5L)
  ).toDF("sym", "t_ts", "trade_id")
  lazy val quotes = Seq(
    ("A", 90L, 1.0), ("A", 100L, 1.5), ("A", 200L, 2.0),
    ("B", 60L, 9.0), ("B", 299L, 8.0)
  ).toDF("sym", "q_ts", "px")

  def run(tol: Option[Long] = None): Map[Long, (Option[Double], Option[Long])] =
    AsofJoin.asofJoin(trades, quotes, "t_ts", "q_ts", Seq("sym" -> "sym"), tol)
      .collect().map(r => r.getLong(2) ->
        ((Option(r.get(3)).map(_.asInstanceOf[Double]),
          Option(r.get(4)).map(_.asInstanceOf[Long])))).toMap

  test("backward as-of picks greatest right ts <= left ts, per key") {
    val m = run()
    assert(m(1L) == ((Some(1.5), Some(100L))))  // exact-ts match visible
    assert(m(2L) == ((Some(2.0), Some(200L))))
    assert(m(3L) == ((None, None)))             // nothing at or before 50
    assert(m(4L) == ((Some(8.0), Some(299L))))
    assert(m(5L) == ((None, None)))             // key with no right rows
  }

  test("tolerance drops stale matches") {
    val m = run(tol = Some(5L))
    assert(m(1L) == ((Some(1.5), Some(100L))))  // age 0 within 5
    assert(m(2L) == ((Some(2.0), Some(200L))))  // age 5 within 5
    assert(m(4L) == ((Some(8.0), Some(299L))))  // age 1
    val m2 = run(tol = Some(0L))
    assert(m2(2L) == ((None, None)))            // age 5 > 0
  }

  test("NULL right payload values carry atomically (whole matched row)") {
    // latest quote for A@205 has px NULL; per-column carry would resurrect
    // the older row's 2.0 while q_ts says 201 — atomic carry must keep NULL
    val q = Seq(
      ("A", 100L, Some(1.5)), ("A", 200L, Some(2.0)), ("A", 201L, None: Option[Double])
    ).toDF("sym", "q_ts", "px")
    val m = AsofJoin.asofJoin(trades, q, "t_ts", "q_ts", Seq("sym" -> "sym"))
      .collect().map(r => r.getLong(2) ->
        ((Option(r.get(3)).map(_.asInstanceOf[Double]),
          Option(r.get(4)).map(_.asInstanceOf[Long])))).toMap
    assert(m(1L) == ((Some(1.5), Some(100L))))
    assert(m(2L) == ((None, Some(201L))))       // the whole 201 row, px NULL
    // tolerance checks the matched row's ts, not a stale per-column carry
    val mt = AsofJoin.asofJoin(trades, q, "t_ts", "q_ts", Seq("sym" -> "sym"), Some(4L))
      .collect().map(r => r.getLong(2) ->
        Option(r.get(4)).map(_.asInstanceOf[Long])).toMap
    assert(mt(2L) == Some(201L))                // age 4 within 5
    assert(mt(1L) == Some(100L))
  }

  test("plan is one shuffle + window, no nested-loop join") {
    val plan = AsofJoin.asofJoin(trades, quotes, "t_ts", "q_ts", Seq("sym" -> "sym"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"))
    assert(plan.contains("Window"))
  }
}
