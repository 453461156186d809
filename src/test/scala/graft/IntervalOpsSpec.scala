package graft

import org.apache.spark.sql.functions._
import graft.operators.IntervalOps

class IntervalOpsSpec extends SparkSuite {
  import spark.implicits._

  def spans(xs: (String, Long, Long)*) = xs.toSeq.toDF("k", "s", "e")
    .select(col("k"), struct(col("s").as("start"), col("e").as("stop")).as("span"))

  test("mergeIntervals coalesces overlapping and touching, keeps gaps apart") {
    val d = spans(("a", 0L, 10L), ("a", 5L, 20L), ("a", 20L, 30L), // one merged run [0,30)
      ("a", 40L, 50L),                                             // gap -> separate
      ("b", 0L, 5L))
    val m = IntervalOps.mergeIntervals(d, Seq("k"), "span")
      .select(col("k"), col("span.start"), col("span.stop"), col("n_merged"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(m == Set(("a", 0L, 30L, 3L), ("a", 40L, 50L, 1L), ("b", 0L, 5L, 1L)))
  }

  test("nested intervals merge into their container") {
    val d = spans(("a", 0L, 100L), ("a", 10L, 20L), ("a", 30L, 40L))
    val m = IntervalOps.mergeIntervals(d, Seq("k"), "span").collect()
    assert(m.length == 1 && m.head.getLong(2) == 3L)
  }

  test("coveredDuration counts overlap once") {
    val d = spans(("a", 0L, 10L), ("a", 5L, 15L), ("a", 20L, 25L))
    val c = IntervalOps.coveredDuration(d, Seq("k"), "span").head
    assert(c.getLong(1) == 20L) // [0,15) + [20,25)
  }

  test("gaps: complement between merged runs; none within a covered run or across keys") {
    val d = spans(("a", 0L, 10L), ("a", 5L, 20L), ("a", 20L, 30L), // run [0,30)
      ("a", 40L, 50L), ("a", 70L, 80L),                            // gaps [30,40), [50,70)
      ("b", 0L, 5L))                                               // single run, no gap
    val g = IntervalOps.gaps(d, Seq("k"), "span")
      .select(col("k"), col("span.start"), col("span.stop"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(g == Set(("a", 30L, 40L), ("a", 50L, 70L)))
    // gaps ∪ merged tile the covering span exactly: covered + gap durations
    // == span width
    val Some((lo, hi)) = graft.intervals.IntervalCols.coveringSpan(d.where(col("k") === "a"), "span")
    val covered = IntervalOps.coveredDuration(d.where(col("k") === "a"), Seq("k"), "span")
      .head.getLong(1)
    val gapSum = g.filter(_._1 == "a").map(x => x._3 - x._2).sum
    assert(covered + gapSum == hi - lo)
  }

  test("sessionize splits on gap, pads stop, counts events") {
    val ev = Seq(("u1", 0L), ("u1", 10L), ("u1", 100L), ("u2", 5L))
      .toDF("user", "ts")
    val s = IntervalOps.sessionize(ev, Seq("user"), "ts", gapNs = 50L, padNs = 1L)
      .select(col("user"), col("session"), col("span.start"), col("span.stop"), col("n_events"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSet
    assert(s == Set(("u1", 1L, 0L, 11L, 2L), ("u1", 2L, 100L, 101L, 1L), ("u2", 1L, 5L, 6L, 1L)))
  }

  test("property: merged intervals equal brute-force union on random sets") {
    (1 to 10).foreach { seed =>
      val rng = new scala.util.Random(seed.toLong)
      val xs = List.fill(rng.nextInt(80))(("k", {
        val s = rng.nextInt(1000).toLong; (s, s + 1L + rng.nextInt(60)) }))
        .map { case (k, (s, e)) => (k, s, e) }
      if (xs.nonEmpty) {
        // brute-force union of half-open intervals
        val sorted = xs.map(x => (x._2, x._3)).sortBy(identity)
        val merged = sorted.tail.foldLeft(List(sorted.head)) { case (acc, (s, e)) =>
          val (cs, ce) = acc.head
          if (s <= ce) (cs, math.max(ce, e)) :: acc.tail else (s, e) :: acc
        }.reverse.toSet
        val got = IntervalOps.mergeIntervals(spans(xs: _*), Seq("k"), "span")
          .select(col("span.start"), col("span.stop"))
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        assert(got == merged, s"seed=$seed")
        // covered duration equals sum of merged lengths
        val cov = IntervalOps.coveredDuration(spans(xs: _*), Seq("k"), "span")
          .head.getLong(1)
        assert(cov == merged.toSeq.map(x => x._2 - x._1).sum, s"seed=$seed")
      }
    }
  }

  test("property: sessionize partitions events; sessions are gap-separated and internally dense") {
    (1 to 5).foreach { seed =>
      val rng = new scala.util.Random(100L + seed)
      val ts = List.fill(60)(rng.nextInt(10000).toLong).distinct.sorted
      val ev = ts.map(t => ("u", t)).toDF("user", "ts")
      val gap = 200L
      val sessions = IntervalOps.sessionize(ev, Seq("user"), "ts", gap)
        .select(col("span.start"), col("span.stop"), col("n_events"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
      // total events preserved
      assert(sessions.map(_._3).sum == ts.length)
      // consecutive sessions separated by more than gap
      sessions.sliding(2).foreach {
        case Array(a, b) => assert(b._1 - a._2 > gap)
        case _ => ()
      }
      // within-session max gap <= gap (recheck against raw points)
      sessions.foreach { case (s, e, _) =>
        val pts = ts.filter(t => t >= s && t <= e)
        pts.sliding(2).foreach {
          case List(x, y) => assert(y - x <= gap)
          case _ => ()
        }
      }
    }
  }

  test("setIntersect/setSubtract/setUnion on hand-built sets") {
    val a = spans(("k1", 0L, 10L), ("k1", 20L, 30L), ("k2", 0L, 5L))
    val b = spans(("k1", 5L, 25L), ("k2", 10L, 15L))
    def collect(df: org.apache.spark.sql.DataFrame) =
      df.select(col("k"), col("span.start"), col("span.stop"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    // A∩B: [5,10) and [20,25) for k1; nothing for k2 (disjoint)
    assert(collect(IntervalOps.setIntersect(a, b, Seq("k"), "span")) ==
      Set(("k1", 5L, 10L), ("k1", 20L, 25L)))
    // A\B: [0,5) and [25,30) for k1; all of k2's A
    assert(collect(IntervalOps.setSubtract(a, b, Seq("k"), "span")) ==
      Set(("k1", 0L, 5L), ("k1", 25L, 30L), ("k2", 0L, 5L)))
    // A∪B merges the touching/overlapping chain [0,10)∪[5,25)∪[20,30) = [0,30)
    assert(collect(IntervalOps.setUnion(a, b, Seq("k"), "span")) ==
      Set(("k1", 0L, 30L), ("k2", 0L, 5L), ("k2", 10L, 15L)))
  }

  test("set ops: adjacent segments merge; empty operands and degenerate intervals behave") {
    // B splits exactly at an internal boundary: intersect segments [0,4),[4,10)
    // must come back merged as [0,10)
    val a = spans(("k", 0L, 10L))
    val b = spans(("k", 0L, 4L), ("k", 4L, 10L))
    val i = IntervalOps.setIntersect(a, b, Seq("k"), "span")
      .select(col("span.start"), col("span.stop"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(i == Set((0L, 10L)))
    // degenerate (start >= stop) rows are empty sets: no effect on either side
    val aDeg = spans(("k", 0L, 10L), ("k", 7L, 7L), ("k", 9L, 3L))
    val bDeg = spans(("k", 2L, 2L))
    assert(IntervalOps.setIntersect(aDeg, bDeg, Seq("k"), "span").count() == 0)
    val s = IntervalOps.setSubtract(aDeg, bDeg, Seq("k"), "span")
      .select(col("span.start"), col("span.stop"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(s == Set((0L, 10L)))
    // empty B: subtract = merged A, intersect = empty
    val empty = spans().where(lit(false))
    assert(IntervalOps.setIntersect(a, empty, Seq("k"), "span").count() == 0)
    assert(IntervalOps.setSubtract(a, empty, Seq("k"), "span")
      .select(col("span.start"), col("span.stop"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet == Set((0L, 10L)))
    // union drops degenerate rows too (merge alone would emit them back)
    val u = IntervalOps.setUnion(aDeg, bDeg, Seq("k"), "span")
      .select(col("span.start"), col("span.stop"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(u == Set((0L, 10L)))
  }

  test("property: set ops equal dense-point simulation on random sets") {
    (1 to 10).foreach { seed =>
      val rng = new scala.util.Random(4000L + seed)
      def mk(n: Int) = List.fill(n) {
        val s = rng.nextInt(300).toLong; ("k", s, s + 1L + rng.nextInt(40))
      }
      val xs = mk(1 + rng.nextInt(25))
      val ys = mk(rng.nextInt(25))
      val aCov = (0L until 400L).filter(p => xs.exists(x => x._2 <= p && p < x._3)).toSet
      val bCov = (0L until 400L).filter(p => ys.exists(y => y._2 <= p && p < y._3)).toSet
      def toIntervals(pts: Set[Long]): Set[(Long, Long)] =
        if (pts.isEmpty) Set.empty
        else pts.toSeq.sorted.foldLeft(List.empty[(Long, Long)]) {
          case (Nil, p) => List((p, p + 1))
          case ((s, e) :: t, p) => if (p == e) (s, p + 1) :: t else (p, p + 1) :: (s, e) :: t
        }.toSet
      def run(df: org.apache.spark.sql.DataFrame) =
        df.select(col("span.start"), col("span.stop"))
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val aDf = spans(xs: _*)
      val bDf = if (ys.isEmpty) spans(xs: _*).where(lit(false)) else spans(ys: _*)
      assert(run(IntervalOps.setIntersect(aDf, bDf, Seq("k"), "span")) ==
        toIntervals(aCov intersect bCov), s"intersect seed=$seed")
      assert(run(IntervalOps.setSubtract(aDf, bDf, Seq("k"), "span")) ==
        toIntervals(aCov diff bCov), s"subtract seed=$seed")
      assert(run(IntervalOps.setUnion(aDf, bDf, Seq("k"), "span")) ==
        toIntervals(aCov union bCov), s"union seed=$seed")
    }
  }

  test("set ops plan: no join, no explode — boundary sweep is window-only") {
    val a = spans(("k", 0L, 10L))
    val b = spans(("k", 5L, 15L))
    val plan = IntervalOps.setIntersect(a, b, Seq("k"), "span")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join") && !plan.contains("Generate"))
  }

  test("windowCoverage: merged-overlap fraction per window, overlap counted once, empty windows zero") {
    val win = Seq((1L, 0L, 100L), (2L, 100L, 200L), (3L, 200L, 300L))
      .toDF("idx", "s", "e")
      .select(col("idx"), struct(col("s").as("start"), col("e").as("stop")).as("span"))
    // window 1: [10,30) ∪ [20,50) = 40 ns covered -> 0.4 (overlap once);
    // window 2: a span straddling its start clips to [100,120) -> 0.2;
    // window 3: untouched -> 0
    val sp = Seq((10L, 30L), (20L, 50L), (80L, 120L))
      .toDF("s", "e")
      .select(struct(col("s").as("start"), col("e").as("stop")).as("span"))
    val got = IntervalOps.windowCoverage(win, sp, Seq("idx"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getDouble(3)))).toMap
    assert(got(1L) == ((60L, 0.6))) // [10,50) ∪ [80,100) = 40 + 20
    assert(got(2L) == ((20L, 0.2)))
    assert(got(3L) == ((0L, 0.0)))
  }

  test("single shuffle: plan has one Exchange for window + reuses it for the aggregate") {
    val d = spans(("a", 0L, 10L))
    val plan = IntervalOps.mergeIntervals(d, Seq("k"), "span").queryExecution.executedPlan.toString
    // partitioned by k for the window; groupBy (k, __grp) may add one more —
    // but never a join or explode
    assert(!plan.contains("Join") && !plan.contains("Generate"))
  }

  test("maxConcurrency: peak overlap count, half-open adjacency not concurrent, earliest peak position") {
    val d = spans(
      ("a", 0L, 10L), ("a", 5L, 15L), ("a", 8L, 9L),   // peak 3 on [8,9)
      ("a", 15L, 20L),                                 // meets: [5,15) & [15,20) never concurrent
      ("a", 30L, 40L), ("a", 30L, 40L),                // second peak of 2 < 3
      ("b", 0L, 5L))
    val got = IntervalOps.maxConcurrency(d, Seq("k"), "span")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got("a") == ((3L, 8L)))
    assert(got("b") == ((1L, 0L)))
  }

  test("maxConcurrency: tie on the peak resolves to the earliest position") {
    // two separate runs both reach 2; first does so at t=5
    val d = spans(("a", 0L, 10L), ("a", 5L, 10L), ("a", 20L, 30L), ("a", 25L, 30L))
    val r = IntervalOps.maxConcurrency(d, Seq("k"), "span").head
    assert((r.getLong(1), r.getLong(2)) == ((2L, 5L)))
  }

  test("maxConcurrency: simultaneous starts count together (peer-inclusive sweep)") {
    val d = spans(("a", 7L, 10L), ("a", 7L, 12L), ("a", 7L, 14L))
    val r = IntervalOps.maxConcurrency(d, Seq("k"), "span").head
    assert((r.getLong(1), r.getLong(2)) == ((3L, 7L)))
  }

  test("timeWeightedMean: duration weighting, long-overflow-proof decimal sum") {
    val d = Seq(
      ("a", 0L, 10L, 100L),   // v=100 for 10 ns
      ("a", 10L, 40L, 400L),  // v=400 for 30 ns
      ("b", 0L, 5L, 7000L)).toDF("k", "s", "e", "v")
      .select(col("k"), col("v"),
        struct(col("s").as("start"), col("e").as("stop")).as("span"))
    val got = IntervalOps.timeWeightedMean(d, Seq("k"), "span", "v")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    // a: (100*10 + 400*30) / 1000 / 40 = 13000/40000 = 0.325
    assert(got("a") == ((40L, 0.325)))
    assert(got("b") == ((5L, 7.0)))
    // weighted-product sum beyond 2^63 (2 x 4e19) while the duration sum
    // stays in long range — the decimal accumulator keeps it exact
    val big = Seq(("x", 0L, 4000000000000000000L, 10L),
      ("x", 0L, 4000000000000000000L, 10L)).toDF("k", "s", "e", "v")
      .select(col("k"), col("v"),
        struct(col("s").as("start"), col("e").as("stop")).as("span"))
    val r = IntervalOps.timeWeightedMean(big, Seq("k"), "span", "v").head
    assert(r.getLong(1) == 8000000000000000000L)
    assert(r.getDouble(2) == 0.01) // v/scale = 10/1000 held throughout
  }

  test("allenRelation: all 13 base relations classified, null propagates") {
    import graft.intervals.IntervalCols
    val cases = Seq(
      // (a_s, a_e, b_s, b_e, expected)  — a relative to b = [10, 20)
      (0L, 5L, 10L, 20L, "precedes"),
      (0L, 10L, 10L, 20L, "meets"),
      (5L, 15L, 10L, 20L, "overlaps"),
      (5L, 20L, 10L, 20L, "finished_by"),
      (5L, 25L, 10L, 20L, "contains"),
      (10L, 15L, 10L, 20L, "starts"),
      (10L, 20L, 10L, 20L, "equals"),
      (10L, 25L, 10L, 20L, "started_by"),
      (12L, 18L, 10L, 20L, "during"),
      (15L, 20L, 10L, 20L, "finishes"),
      (15L, 25L, 10L, 20L, "overlapped_by"),
      (20L, 25L, 10L, 20L, "met_by"),
      (25L, 30L, 10L, 20L, "preceded_by"))
    val df = cases.toDF("as_", "ae", "bs", "be", "want")
      .select(struct(col("as_").as("start"), col("ae").as("stop")).as("a"),
        struct(col("bs").as("start"), col("be").as("stop")).as("b"), col("want"))
      .withColumn("got", IntervalCols.allenRelation(col("a"), col("b")))
    assert(df.where(col("got") =!= col("want")).count() == 0)
    assert(df.select(countDistinct(col("got"))).head.getLong(0) == 13)
    val n = spans(("a", 0L, 10L)).select(
      IntervalCols.allenRelation(col("span"),
        struct(lit(null).cast("long").as("start"), lit(5L).as("stop"))).as("r"))
    assert(n.head.isNullAt(0))
  }

  test("maxConcurrency plan: no join, window Exchange reused by the aggregate") {
    val d = spans(("a", 0L, 10L), ("a", 5L, 15L))
    val plan = IntervalOps.maxConcurrency(d, Seq("k"), "span")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"))
    assert(plan.split("Exchange").length - 1 <= 2) // union read + one key shuffle
  }
}
