package graft

import org.apache.spark.sql.functions._
import graft.functions.EventOps

class EventOpsSpec extends SparkSuite {
  import spark.implicits._

  test("funnel: first-touch stage times, strictly-later ordering, partial funnels NULL from first miss") {
    val ev = Seq(
      // u1 completes: view@1, click@5 (the @0 click precedes the view and
      // must NOT count), purchase@9
      ("u1", "click", 0L), ("u1", "view", 1L), ("u1", "click", 5L),
      ("u1", "click", 7L), ("u1", "purchase", 9L),
      // u2 stalls after view: purchase exists but no click before it
      ("u2", "view", 2L), ("u2", "purchase", 3L),
      // u3 never views -> no row at all
      ("u3", "click", 1L), ("u3", "purchase", 2L),
      // u4: click at the SAME instant as view does not advance (strict >)
      ("u4", "view", 4L), ("u4", "click", 4L)).toDF("u", "et", "t")
    val got = EventOps.funnel(ev, Seq("u"), "et", "t",
      Seq("view", "click", "purchase")).collect()
      .map(r => r.getString(0) -> ((r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3)))).toMap
    assert(got == Map(
      "u1" -> ((1L, 5L, 9L)),
      "u2" -> ((2L, -1L, -1L)),
      "u4" -> ((4L, -1L, -1L))))
  }

  test("funnel guards: short/duplicate stages and reserved output names rejected") {
    val ev = Seq(("u", "a", 1L)).toDF("u", "et", "t")
    intercept[IllegalArgumentException] {
      EventOps.funnel(ev, Seq("u"), "et", "t", Seq("a"))
    }
    intercept[IllegalArgumentException] {
      EventOps.funnel(ev, Seq("u"), "et", "t", Seq("a", "a"))
    }
    intercept[IllegalArgumentException] {
      EventOps.funnel(ev.withColumn("t_a", lit(1L)), Seq("u"), "et", "t",
        Seq("a", "b"))
    }
  }

  test("islands: maximal consecutive runs per key; singletons; keys independent") {
    val d = Seq(
      ("a", 1L), ("a", 2L), ("a", 3L), ("a", 7L), ("a", 8L), ("a", 10L),
      ("b", 3L)).toDF("k", "id")
    val got = EventOps.islands(d, Seq("k"), "id").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == Set(
      ("a", 1L, 3L, 3L), ("a", 7L, 8L, 2L), ("a", 10L, 10L, 1L),
      ("b", 3L, 3L, 1L)))
  }

  test("islands plan: no join, single key shuffle reused by the aggregate") {
    val d = Seq(("a", 1L)).toDF("k", "id")
    val plan = EventOps.islands(d, Seq("k"), "id")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"))
  }

  test("charEntropy: hand-computed distribution, single-char doc is +0.0, empty omitted") {
    import graft.functions.{TextFunctions => TF}
    val d = Seq((1L, "aab"), (2L, "aaaa"), (3L, "")).toDF("id", "text")
    val got = TF.charEntropy(d, "id", "text").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    def r6(x: Double): Double = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val want = 0.0 + r6(-(2.0 / 3.0) * StrictMath.log(2.0 / 3.0)) +
      r6(-(1.0 / 3.0) * StrictMath.log(1.0 / 3.0))
    assert(got(1L) == ((3L, want)), s"got ${got(1L)} want $want")
    assert(got(2L)._2 == 0.0 &&
      java.lang.Double.doubleToRawLongBits(got(2L)._2) == 0L) // +0.0, not -0.0
    assert(!got.contains(3L))
  }

  // ------------------------------------------------------- attribution

  test("attribution: U-shaped credits, window exclusion, single-touch conversion") {
    import spark.implicits._
    // user 1: touches t=1,2,3 before conv at t=10 (all in window);
    // a stale touch at t=-500 outside the 100-tick lookback;
    // user 2: one touch -> full credit
    val ev = Seq(
      (101L, 1L, "click", -500L), (102L, 1L, "click", 1L),
      (103L, 1L, "view", 2L), (104L, 1L, "click", 3L),
      (105L, 1L, "purchase", 10L),
      (201L, 2L, "view", 5L), (202L, 2L, "purchase", 6L)
    ).toDF("event_id", "user_id", "event_type", "t")
    val m = graft.functions.EventOps.attribution(ev, Seq("user_id"),
        "event_type", "t", "event_id", Seq("click", "view"), "purchase",
        lookback = 100L, model = "position")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    // clicks: first (0.4) + last (0.4) of user1; views: middle 0.2 + solo 1.0
    assert(m("click") == ((2L, 1L, 0.8)))
    assert(m("view") == ((2L, 2L, 1.2)))
    intercept[IllegalArgumentException] {
      graft.functions.EventOps.attribution(ev, Seq("user_id"), "event_type",
        "t", "event_id", Seq("click"), "purchase", 0L, "position") }
    intercept[IllegalArgumentException] {
      graft.functions.EventOps.attribution(ev, Seq("user_id"), "event_type",
        "t", "event_id", Seq("click", "purchase"), "purchase", 10L, "linear") }
    intercept[IllegalArgumentException] {
      graft.functions.EventOps.attribution(ev, Seq("user_id"), "event_type",
        "t", "event_id", Seq("click"), "purchase", 10L, "shapley") }
  }

  test("attribution: linear model splits evenly; overlapping windows credit both conversions") {
    import spark.implicits._
    val ev = Seq(
      (1L, 1L, "click", 1L), (2L, 1L, "view", 2L),
      (3L, 1L, "purchase", 3L), (4L, 1L, "purchase", 4L)
    ).toDF("event_id", "user_id", "event_type", "t")
    val got = graft.functions.EventOps.attribution(ev, Seq("user_id"),
        "event_type", "t", "event_id", Seq("click", "view"), "purchase",
        lookback = 100L, model = "linear")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getDouble(3)))).toMap
    // both touches precede both conversions: each conv splits 0.5/0.5
    assert(got("click") == ((2L, 2L, 1.0)))
    assert(got("view") == ((2L, 2L, 1.0)))
  }

  // --------------------------------------------------------- topSequences

  test("topSequences: ordered trigrams per key, tie rank, incomplete windows dropped") {
    import spark.implicits._
    val rows = Seq(
      (1L, "v", 1L, 1L), (1L, "c", 2L, 2L), (1L, "p", 3L, 3L),
      (1L, "v", 4L, 4L), (1L, "c", 5L, 5L), (1L, "p", 6L, 6L),
      (2L, "v", 1L, 7L), (2L, "c", 2L, 8L), (2L, "p", 3L, 9L),
      (3L, "v", 1L, 10L), (3L, "c", 2L, 11L)) // too short: no trigram
      .toDF("u", "et", "t", "id")
    val got = graft.functions.EventOps.topSequences(rows, Seq("u"), "et",
        "t", "id", n = 3, k = 10)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // u1 contributes v>c>p, c>p>v, p>v>c, v>c>p; u2 v>c>p => v>c>p x3
    assert(got.toSeq == Seq(("v>c>p", 3L, 1L), ("c>p>v", 1L, 2L),
      ("p>v>c", 1L, 3L)))
    intercept[IllegalArgumentException] {
      graft.functions.EventOps.topSequences(rows, Seq("u"), "et", "t", "id", 1, 5) }
    intercept[IllegalArgumentException] {
      graft.functions.EventOps.topSequences(rows, Seq("u"), "et", "t", "id", 3, 0) }
  }

  test("topSequences: NULL event type drops every window containing it (head included)") {
    import spark.implicits._
    // null at the HEAD of a window: concat_ws would silently skip it and
    // emit a malformed 2-element "trigram" without the head guard
    val rows = Seq((1L, Option.empty[String], 1L, 1L),
      (1L, Some("b"), 2L, 2L), (1L, Some("c"), 3L, 3L),
      (1L, Some("d"), 4L, 4L))
      .toDF("u", "et", "t", "id")
    val got = graft.functions.EventOps.topSequences(rows, Seq("u"), "et",
        "t", "id", n = 3, k = 10)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(got.toSeq == Seq(("b>c>d", 1L)), got.mkString(","))
  }

  // ---------------------------------------------------------- rateAnomaly

  test("rateAnomaly: trailing-frame z, min-points and zero-variance guards") {
    import spark.implicits._
    // key k: 24 ticks of alternating 10/14 then a spike of 36
    val base = (0 until 24).map(i => ("k", i.toLong, if (i % 2 == 0) 10 else 14))
    val rows = (base ++ Seq(("k", 24L, 36))).flatMap { case (k, t, c) =>
      Seq.fill(c)((k, t)) }
    val got = graft.functions.EventOps.rateAnomaly(
        rows.toDF("et", "hr"), Seq("et"), "hr", window = 24, minPoints = 12)
      .collect().map(r => r.getLong(1) -> ((r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getDouble(4))))).toMap
    // tick 24 sees all 24 trailing ticks: mean 12, var = 24*4/(24*23)... 
    val s = base.map(_._3.toLong).sum
    val q = base.map(c => c._3.toLong * c._3).sum
    val n = 24.0
    val v = (n * q - s * s) / (n * (n - 1.0))
    val z = math.rint((36.0 - s / n) / math.sqrt(v) * 1e6) / 1e6
    assert(got(24L) == ((36L, 24L, Some(z))))
    // early ticks: fewer than 12 trailing points -> NULL z
    assert(got(0L)._3.isEmpty && got(11L)._3.isEmpty)
    assert(got(12L)._3.isDefined)
    // constant series -> zero variance -> NULL
    val const = (0 until 30).flatMap(i => Seq.fill(5)(("c", i.toLong)))
    val g2 = graft.functions.EventOps.rateAnomaly(
        const.toDF("et", "hr"), Seq("et"), "hr", 24, 12)
      .collect().map(r => r.getLong(1) -> r.isNullAt(4)).toMap
    assert(g2.values.forall(identity))
    intercept[IllegalArgumentException] {
      graft.functions.EventOps.rateAnomaly(const.toDF("et", "hr"),
        Seq("et"), "hr", 1, 1) }
    intercept[IllegalArgumentException] {
      graft.functions.EventOps.rateAnomaly(const.toDF("et", "hr"),
        Seq("et"), "hr", 24, 25) }
  }

  // ---------------------------------------------------------- cusumAlarms

  test("cusumAlarms: driver replica on a drifting series; stable series never alarms; guards") {
    import spark.implicits._
    // 20 stable ticks of 10, then 10 drifted ticks of 30
    val series = (0 until 20).map(t => (t.toLong, 10)) ++
      (20 until 30).map(t => (t.toLong, 30))
    val rows = series.flatMap { case (t, c) => Seq.fill(c)(("k", t)) }
    val got = graft.functions.EventOps.cusumAlarms(
        rows.toDF("et", "hr"), Seq("et"), "hr", pctSlack = 10,
        pctThreshold = 300).collect()(0)
    // driver replica of the scaled integer fold
    val s = series.map(_._2.toLong).sum; val n = series.size.toLong
    var cus = 0L; var nal = 0L; var mx = 0L; var first = -1L
    series.foreach { case (t, x) =>
      cus = math.max(0L, cus + (100L * (x * n - s) - 10L * s))
      if (cus > 300L * s) { nal += 1; if (first == -1L) first = t }
      mx = math.max(mx, cus)
    }
    assert((got.getLong(1), got.getLong(2), got.getLong(3)) == ((n, nal, mx)))
    assert(got.getLong(4) == first && nal > 0)
    val stable = (0 until 30).flatMap(t => Seq.fill(10)(("k", t.toLong)))
    val g2 = graft.functions.EventOps.cusumAlarms(
      stable.toDF("et", "hr"), Seq("et"), "hr", 10, 300).collect()(0)
    assert(g2.getLong(2) == 0L && g2.isNullAt(4))
    intercept[IllegalArgumentException] {
      graft.functions.EventOps.cusumAlarms(stable.toDF("et", "hr"),
        Seq("et"), "hr", -1, 300) }
    intercept[IllegalArgumentException] {
      graft.functions.EventOps.cusumAlarms(stable.toDF("et", "hr"),
        Seq("et"), "hr", 10, 0) }
  }
}
