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

  test("property: random inputs with ties and NULL payloads match a brute-force oracle") {
    val rng = new scala.util.Random(17L)
    (1 to 8).foreach { round =>
      val syms = Seq("A", "B", "C")
      val ls = (1L to 40L).map(i =>
        (syms(rng.nextInt(3)), rng.nextInt(50).toLong, i))
      // right side deduped on (sym, q_ts) so the brute-force oracle stays
      // trivial; same-tick ties have their own deterministic-carry test
      val rs = (1L to 30L).map(i =>
        (syms(rng.nextInt(3)), rng.nextInt(50).toLong,
          if (rng.nextBoolean()) Some(rng.nextInt(100).toDouble) else None, i))
        .groupBy(r => (r._1, r._2)).map(_._2.head).toSeq
      val lDF = ls.toDF("sym", "t_ts", "trade_id")
      val rDF = rs.toDF("sym", "q_ts", "px", "q_id")
      val tol = if (round % 2 == 0) Some(7L) else None
      val got = AsofJoin.asofJoin(lDF, rDF, "t_ts", "q_ts", Seq("sym" -> "sym"), tol)
        .select("trade_id", "px", "q_ts")
        .collect().map(r => r.getLong(0) ->
          ((Option(r.get(1)).map(_.asInstanceOf[Double]),
            Option(r.get(2)).map(_.asInstanceOf[Long])))).toMap
      ls.foreach { case (sym, ts, id) =>
        // brute force: the matched ROW is the one with max q_ts <= ts
        // (within tolerance), tie broken by latest (q_ts, q_id) arrival
        // order of the window (q_ts, side) sort — at equal q_ts the LAST
        // right row in (ts, side) order wins, which for the union sort is
        // the max q_id among the tied rows
        val cands = rs.filter(r => r._1 == sym && r._2 <= ts &&
          tol.forall(t => r._2 >= ts - t))
        val expected =
          if (cands.isEmpty) (None, None)
          else {
            val best = cands.maxBy(_._2)
            (best._3, Some(best._2))
          }
        assert(got(id) == expected, s"round=$round id=$id sym=$sym ts=$ts tol=$tol")
      }
    }
  }

  test("forward as-of picks smallest right ts >= left ts; nearest picks the closer side") {
    import AsofJoin.Direction
    def runDir(d: AsofJoin.Direction, tol: Option[Long] = None) =
      AsofJoin.asofJoin(trades, quotes, "t_ts", "q_ts", Seq("sym" -> "sym"), tol, d)
        .collect().map(r => r.getLong(2) ->
          ((Option(r.get(3)).map(_.asInstanceOf[Double]),
            Option(r.get(4)).map(_.asInstanceOf[Long])))).toMap
    val f = runDir(Direction.Forward)
    assert(f(1L) == ((Some(1.5), Some(100L))))   // equal ts visible forward too
    assert(f(2L) == ((None, None)))              // nothing at/after 205 for A
    assert(f(3L) == ((Some(9.0), Some(60L))))    // first at/after 50
    assert(f(5L) == ((None, None)))
    val n = runDir(Direction.Nearest)
    assert(n(1L) == ((Some(1.5), Some(100L))))   // exact match, dist 0
    assert(n(2L) == ((Some(2.0), Some(200L))))   // only backward exists
    assert(n(3L) == ((Some(9.0), Some(60L))))    // only forward exists
    // tolerance applies per side: forward match at dist 10 dropped at tol 5
    val ft = runDir(Direction.Forward, Some(5L))
    assert(ft(3L) == ((None, None)))             // 60 - 50 = 10 > 5
  }

  test("nearest tie prefers backward; equidistant quotes resolve deterministically") {
    val q = Seq(("A", 95L, 1.0), ("A", 105L, 2.0)).toDF("sym", "q_ts", "px")
    val l = Seq(("A", 100L, 1L)).toDF("sym", "t_ts", "trade_id")
    val m = AsofJoin.asofJoin(l, q, "t_ts", "q_ts", Seq("sym" -> "sym"),
        None, AsofJoin.Direction.Nearest)
      .collect().map(r => (r.get(3), r.get(4))).head
    assert(m == ((1.0, 95L)))                    // dist 5 both ways -> backward
  }

  test("property: forward and nearest match a brute-force oracle") {
    val rng = new scala.util.Random(23L)
    (1 to 6).foreach { round =>
      val syms = Seq("A", "B")
      val ls = (1L to 30L).map(i => (syms(rng.nextInt(2)), rng.nextInt(50).toLong, i))
      val rs = (1L to 25L).map(i =>
        (syms(rng.nextInt(2)), rng.nextInt(50).toLong, rng.nextInt(100).toDouble, i))
        .groupBy(r => (r._1, r._2)).map(_._2.head).toSeq
      val lDF = ls.toDF("sym", "t_ts", "trade_id")
      val rDF = rs.toDF("sym", "q_ts", "px", "q_id")
      val tol = if (round % 2 == 0) Some(6L) else None
      def collectDir(d: AsofJoin.Direction) =
        AsofJoin.asofJoin(lDF, rDF, "t_ts", "q_ts", Seq("sym" -> "sym"), tol, d)
          .select("trade_id", "q_ts")
          .collect().map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Long])).toMap
      val fGot = collectDir(AsofJoin.Direction.Forward)
      val nGot = collectDir(AsofJoin.Direction.Nearest)
      ls.foreach { case (sym, ts, id) =>
        val back = rs.filter(r => r._1 == sym && r._2 <= ts && tol.forall(t => r._2 >= ts - t))
          .sortBy(_._2).lastOption.map(_._2)
        val fwd = rs.filter(r => r._1 == sym && r._2 >= ts && tol.forall(t => r._2 <= ts + t))
          .sortBy(_._2).headOption.map(_._2)
        assert(fGot(id) == fwd, s"forward round=$round id=$id")
        val nearest = (back, fwd) match {
          case (Some(b), Some(f)) => if (ts - b <= f - ts) Some(b) else Some(f)
          case (b, f) => b.orElse(f)
        }
        assert(nGot(id) == nearest, s"nearest round=$round id=$id")
      }
    }
  }

  test("same-tick right ties carry the max right-row struct, independent of layout") {
    val l = Seq(("A", 100L, 1L)).toDF("sym", "t_ts", "trade_id")
    val back = Seq(("A", 90L, 1.0, 10L), ("A", 90L, 5.0, 11L), ("A", 90L, 3.0, 12L))
    val fwd = Seq(("A", 110L, 1.0, 20L), ("A", 110L, 7.0, 21L), ("A", 110L, 2.0, 22L))
    // carried struct is (px, q_id, __rts): the max px on the winning tick
    // must be chosen whatever the physical partition layout
    (1 to 4).foreach { n =>
      val qb = back.toDF("sym", "q_ts", "px", "q_id").repartition(n)
      val rb = AsofJoin.asofJoin(l, qb, "t_ts", "q_ts", Seq("sym" -> "sym")).collect().head
      assert(rb.getDouble(3) == 5.0 && rb.getLong(4) == 11L, s"backward n=$n")
      val qf = fwd.toDF("sym", "q_ts", "px", "q_id").repartition(n)
      val rf = AsofJoin.asofJoin(l, qf, "t_ts", "q_ts", Seq("sym" -> "sym"),
        None, AsofJoin.Direction.Forward).collect().head
      assert(rf.getDouble(3) == 7.0 && rf.getLong(4) == 21L, s"forward n=$n")
    }
  }

  test("plan is one shuffle + window, no nested-loop join") {
    val plan = AsofJoin.asofJoin(trades, quotes, "t_ts", "q_ts", Seq("sym" -> "sym"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"))
    assert(plan.contains("Window"))
  }
}
