package graft

import org.apache.spark.sql.functions._
import graft.functions.{Dedup, EventOps, Stats}
import graft.operators.IntervalOps

/** Round-9 batch: exact prefix-filtered Jaccard join, maximal-interval
  * reduction, grouped OLS, exact ROC AUC, skew profile, normalized dedup,
  * basket co-occurrence, covariance matrix. */
class RelStatsSpec extends SparkSuite {
  import spark.implicits._

  // ------------------------------------------------------- jaccardJoin

  private def bruteJaccard(docs: Seq[(Long, String)], tau: Double) = {
    val sets = docs.map { case (id, t) =>
      id -> t.split("\\s+").filter(_.nonEmpty).toSet }.toMap
    (for {
      a <- sets.keys; b <- sets.keys if a < b
      if sets(a).nonEmpty && sets(b).nonEmpty
      inter = (sets(a) & sets(b)).size
      un = (sets(a) | sets(b)).size
      if inter.toDouble / un >= tau
    } yield (a, b, sets(a).size.toLong, sets(b).size.toLong, inter.toLong,
      math.rint(inter.toDouble / un * 1e6) / 1e6)).toSet
  }

  test("jaccardJoin: equals the brute-force all-pairs join, incl. the exact-tau boundary") {
    val docs = Seq(
      1L -> "a b",          // with doc 2: inter 2, union 4 -> exactly 0.5
      2L -> "a b c d",
      3L -> "a b c e",      // with 2: 3/5 = 0.6; with 1: 2/4 = 0.5
      4L -> "x y z",        // disjoint from the a-cluster
      5L -> "x y z w q",    // with 4: 3/5 = 0.6
      6L -> "u v",          // with nothing
      7L -> "a b",          // duplicate of 1: j = 1.0
      8L -> "   ",          // empty after tokenization: excluded
      9L -> "c d e f g h i j") // with 2: 2/10 = 0.2 < tau
    val got = Dedup.jaccardJoin(docs.toDF("doc_id", "text"), "doc_id", "text", 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5))).toSet
    assert(got == bruteJaccard(docs, 0.5), s"got $got")
  }

  test("jaccardJoin: random corpus agrees with brute force at several taus") {
    val rng = new scala.util.Random(7L)
    val vocab = ('a' to 'p').map(_.toString)
    val docs = (1L to 40L).map { id =>
      id -> Seq.fill(3 + rng.nextInt(8))(vocab(rng.nextInt(vocab.size)))
        .mkString(" ")
    }
    for (tau <- Seq(0.3, 0.5, 0.8, 1.0)) {
      val got = Dedup.jaccardJoin(docs.toDF("doc_id", "text"), "doc_id", "text", tau)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getDouble(5))).toSet
      assert(got == bruteJaccard(docs, tau), s"tau=$tau")
    }
  }

  test("jaccardJoin: candidate generation is an equi-join, never all-pairs; tau guarded") {
    val df = Seq(1L -> "a b", 2L -> "b c").toDF("doc_id", "text")
    val plan = Dedup.jaccardJoin(df, "doc_id", "text", 0.5)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop") && !plan.contains("CartesianProduct"),
      s"prefix join degenerated:\n$plan")
    intercept[IllegalArgumentException] {
      Dedup.jaccardJoin(df, "doc_id", "text", 0.0) }
    intercept[IllegalArgumentException] {
      Dedup.jaccardJoin(df, "doc_id", "text", 1.5) }
  }

  // --------------------------------------------------- removeContained

  test("removeContained: nested chains, duplicates, and equal-start ties") {
    val rows = Seq(
      // key A: [0,10) contains [2,8) contains [3,5); [5,15) overlaps only
      ("A", 1L, 0L, 10L), ("A", 2L, 2L, 8L), ("A", 3L, 3L, 5L),
      ("A", 4L, 5L, 15L),
      // key B: duplicates — smaller id survives; equal-start shorter drops
      ("B", 10L, 2L, 8L), ("B", 11L, 2L, 8L), ("B", 12L, 2L, 6L),
      // key C: touching, neither contains
      ("C", 20L, 0L, 5L), ("C", 21L, 5L, 9L))
    val df = rows.toDF("k", "id", "s", "e")
      .select(col("k"), col("id"),
        struct(col("s").as("start"), col("e").as("stop")).as("span"))
    val got = IntervalOps.removeContained(df, Seq("k"), "span", "id")
      .select("k", "id").as[(String, Long)].collect().toSet
    assert(got == Set(("A", 1L), ("A", 4L), ("B", 10L), ("C", 20L), ("C", 21L)))
  }

  test("removeContained: survivors keep full coverage; plan has no join") {
    val f = fixture().withColumn("id", monotonically_increasing_id())
    val out = IntervalOps.removeContained(f, Seq("label"), "span", "id")
    // the fixture's spans are disjoint per construction — nothing drops
    assert(out.count() == f.count())
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"removeContained must not join:\n$plan")
    intercept[IllegalArgumentException] {
      IntervalOps.removeContained(f.withColumn("__pmax", lit(1)),
        Seq("label"), "span", "id") }
  }

  // -------------------------------------------------------- groupedOls

  test("groupedOls: perfect line is exact; zero x-variance nulls out") {
    val pts = Seq.tabulate(20)(i => ("line", i.toLong, 3L * i + 7L)) ++
      Seq(("flat", 5L, 1L), ("flat", 5L, 9L))
    val got = Stats.groupedOls(pts.toDF("g", "x", "y"), Seq("g"), "x", "y")
      .collect().map(r => r.getString(0) -> r).toMap
    val line = got("line")
    assert(line.getLong(1) == 20L && line.getDouble(2) == 3.0 &&
      line.getDouble(3) == 7.0 && line.getDouble(4) == 1.0)
    val flat = got("flat")
    assert(flat.isNullAt(2) && flat.isNullAt(3) && flat.isNullAt(4))
  }

  test("groupedOls: random data matches the driver-side closed form") {
    val rng = new scala.util.Random(11L)
    val pts = Seq.fill(200)(("g", rng.nextInt(1000).toLong,
      rng.nextInt(1000).toLong - 500L))
    val r = Stats.groupedOls(pts.toDF("g", "x", "y"), Seq("g"), "x", "y")
      .collect()(0)
    val n = BigInt(pts.size)
    val sx = pts.map(p => BigInt(p._2)).sum; val sy = pts.map(p => BigInt(p._3)).sum
    val sxy = pts.map(p => BigInt(p._2) * BigInt(p._3)).sum
    val sxx = pts.map(p => BigInt(p._2) * BigInt(p._2)).sum
    val syy = pts.map(p => BigInt(p._3) * BigInt(p._3)).sum
    val num = (n * sxy - sx * sy).toDouble
    val dxx = (n * sxx - sx * sx).toDouble
    val dyy = (n * syy - sy * sy).toDouble
    val slope = num / dxx
    assert(r.getDouble(2) == math.rint(slope * 1e6) / 1e6)
    assert(r.getDouble(3) ==
      math.rint((sy.toDouble - slope * sx.toDouble) / n.toDouble * 1e6) / 1e6)
    assert(r.getDouble(4) == math.rint(num * num / (dxx * dyy) * 1e6) / 1e6)
  }

  // ---------------------------------------------------- rankingMetrics

  test("rankingMetrics: hand-computed hit/MRR/nDCG, no-hit and unknown-query rows, rank cutoff") {
    val results = Seq(
      (1L, 10L, 1L), (1L, 99L, 2L), (1L, 11L, 3L),   // q1: hits at 1, 3
      (2L, 98L, 1L), (2L, 97L, 2L),                  // q2: no hits
      (3L, 30L, 1L),                                 // q3: not in truth
      (1L, 12L, 9L)                                  // beyond k=3: ignored
    ).toDF("q", "d", "rk")
    val truth = Seq((1L, 10L), (1L, 11L), (1L, 12L), (2L, 50L), (4L, 9L))
      .toDF("q", "d")
    val got = Stats.rankingMetrics(results, truth, "q", "d", "rk", 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getBoolean(2), r.getDouble(3), r.getDouble(4)))).toMap
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def g(r: Long) = r6(1.0 / (StrictMath.log(r + 1.0) / StrictMath.log(2.0)))
    // q1: n_rel 3, first hit rank 1, dcg = g(1)+g(3), idcg = g(1)+g(2)+g(3)
    val ndcg1 = r6((0.0 + g(1) + g(3)) / (0.0 + g(1) + g(2) + g(3)))
    assert(got(1L) == ((3L, true, 1.0, ndcg1)), got(1L).toString)
    assert(got(2L) == ((1L, false, 0.0, 0.0)))
    assert(got(3L) == ((0L, false, 0.0, 0.0)))
    assert(!got.contains(4L)) // truth-only queries don't emit rows
    // idcg truncates at k: 5 relevant docs, k=2, perfect top-2 -> ndcg 1.0
    val per = Seq((7L, 1L, 1L), (7L, 2L, 2L)).toDF("q", "d", "rk")
    val tr5 = (1L to 5L).map(d => (7L, d)).toDF("q", "d")
    val p = Stats.rankingMetrics(per, tr5, "q", "d", "rk", 2).collect()(0)
    assert(p.getLong(1) == 5L && p.getDouble(4) == 1.0)
  }

  test("rankingMetricsByLabel == rankingMetrics over the label-derived pair truth") {
    // label universe: docs 1-12 across 3 labels; queries carry a label
    // each (incl. one whose label has no docs -> n_rel 0)
    val dLabels = (1L to 12L).map(d => (d, s"s${d % 3}")).toDF("d", "lab")
    val qLabels = Seq((1L, "s0"), (2L, "s1"), (3L, "s2"), (4L, "zz"))
      .toDF("q", "lab")
    val results = Seq(
      (1L, 3L, 1L), (1L, 4L, 2L), (1L, 6L, 3L),  // q1 label s0: docs 3,6,9,12
      (2L, 1L, 1L), (2L, 2L, 2L),                // q2 label s1: docs 1,4,7,10
      (3L, 5L, 1L), (3L, 9L, 2L),                // q3 label s2: docs 2,5,8,11
      (4L, 1L, 1L)                               // q4: label matches nothing
    ).toDF("q", "d", "rk")
    val truth = qLabels.join(dLabels, "lab").select("q", "d")
    val viaPairs = Stats.rankingMetrics(results, truth, "q", "d", "rk", 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getBoolean(2), r.getDouble(3), r.getDouble(4)))).toMap
    val viaLabel = Stats.rankingMetricsByLabel(results, qLabels, dLabels,
        "q", "d", "rk", "lab", 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getBoolean(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(viaLabel == viaPairs)
    assert(viaLabel(4L) == ((0L, false, 0.0, 0.0))) // label with no docs
  }

  // ------------------------------------------------------------ rocAuc

  test("rocAuc: perfect separation 1.0, reversed 0.0, single tie 0.5") {
    def auc(rows: Seq[(Double, Boolean)]): Double =
      Stats.rocAuc(rows.toDF("s", "l"), "s", col("l"))
        .collect()(0).getDouble(2)
    assert(auc(Seq((0.9, true), (0.8, true), (0.2, false), (0.1, false))) == 1.0)
    assert(auc(Seq((0.1, true), (0.2, true), (0.8, false), (0.9, false))) == 0.0)
    assert(auc(Seq((0.5, true), (0.5, false), (0.5, true))) == 0.5)
  }

  test("rocAuc: tie correction matches the driver rank replica; bucket-scale invariant") {
    val rng = new scala.util.Random(5L)
    // coarse scores force heavy ties
    val rows = Seq.fill(300)((rng.nextInt(10) / 10.0, rng.nextBoolean()))
    val pos = rows.filter(_._2).map(_._1); val neg = rows.filterNot(_._2).map(_._1)
    val a2 = (for (p <- pos; q <- neg)
      yield if (p > q) 2L else if (p == q) 1L else 0L).sum
    val expect = math.rint(a2.toDouble / (2.0 * pos.size * neg.size) * 1e6) / 1e6
    for (scale <- Seq(1.0, 7.0, 1000.0)) {
      val r = Stats.rocAuc(rows.toDF("s", "l"), "s", col("l"), scale).collect()(0)
      assert(r.getLong(0) == pos.size && r.getLong(1) == neg.size &&
        r.getDouble(2) == expect, s"scale=$scale")
    }
  }

  test("rocAuc plan: the data-sized window stays partitioned") {
    val df = Seq((0.1, true), (0.9, false)).toDF("s", "l")
    val plan = Stats.rocAuc(df, "s", col("l"))
      .queryExecution.executedPlan.toString
    // the only SinglePartition window allowed is the bucket-totals frame;
    // the per-score window must be hash-partitioned by bucket
    assert(plan.contains("Window"), plan)
    assert("hashpartitioning\\(__bk".r.findFirstIn(plan).isDefined,
      s"per-score window lost its bucket partitioning:\n$plan")
  }

  // ------------------------------------------------------- skewProfile

  test("skewProfile: closed-form small fixture") {
    val df = Seq("a", "a", "a", "b").toDF("k")
    val r = Stats.skewProfile(df, Seq("k")).collect()(0)
    assert(r.getLong(0) == 4L && r.getLong(1) == 2L && r.getLong(2) == 3L)
    assert(r.getDouble(3) == 2.0)            // p50 of (1, 3)
    assert(r.getDouble(4) == 2.98)           // p99 interpolated
    assert(r.getDouble(5) == 2.0)            // avg
    assert(r.getDouble(6) == 1.5)            // max / avg
    intercept[IllegalArgumentException] { Stats.skewProfile(df, Nil) }
  }

  // --------------------------------------------------- normalizedDedup

  test("normalizedDedup: case/punct/whitespace classes collapse; keep = min id") {
    val docs = Seq(
      (1L, "Hello, World!"), (2L, "hello world"), (3L, "HELLO   world..."),
      (4L, "something else"), (5L, "Hello worlds")).toDF("doc_id", "text")
    val got = Dedup.normalizedDedup(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getBoolean(3)))).toMap
    assert(got(1L) == ((3L, true)) && got(2L) == ((3L, false)) &&
      got(3L) == ((3L, false)))
    assert(got(4L) == ((1L, true)) && got(5L) == ((1L, true)))
    // group ids agree within a group and differ across
    val gids = Dedup.normalizedDedup(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(gids(1L) == gids(2L) && gids(2L) == gids(3L))
    assert(Set(gids(1L), gids(4L), gids(5L)).size == 3)
  }

  // ------------------------------------------------------ cooccurrence

  test("cooccurrence: hand-computed cosine/jaccard/lift; minSupport gates") {
    val ev = Seq((1L, "x"), (1L, "y"), (2L, "x"), (2L, "y"), (3L, "x"),
      (3L, "z"), (3L, "z")).toDF("bk", "it") // dup (3, z) collapses
    val got = EventOps.cooccurrence(ev, "bk", "it", minSupport = 2L)
      .collect()
    assert(got.length == 1)
    val r = got(0)
    assert(r.getString(0) == "x" && r.getString(1) == "y")
    assert(r.getLong(2) == 3L && r.getLong(3) == 2L && r.getLong(4) == 2L)
    assert(r.getDouble(5) == math.rint(2.0 / math.sqrt(6.0) * 1e6) / 1e6)
    assert(r.getDouble(6) == math.rint(2.0 / 3.0 * 1e6) / 1e6)
    assert(r.getDouble(7) == 1.0) // 2*3/(3*2)
    val all = EventOps.cooccurrence(ev, "bk", "it", minSupport = 1L)
      .collect().map(r2 => (r2.getString(0), r2.getString(1))).toSet
    assert(all == Set(("x", "y"), ("x", "z")))
    intercept[IllegalArgumentException] {
      EventOps.cooccurrence(ev, "bk", "it", minSupport = 0L) }
  }

  // --------------------------------------------------------- covMatrix

  test("covMatrix: driver replica on random ints; diagonal is the variance") {
    val rng = new scala.util.Random(3L)
    val rows = Seq.fill(50)((rng.nextInt(100).toLong,
      rng.nextInt(1000).toLong - 500L, rng.nextInt(10).toLong))
    val got = Stats.covMatrix(rows.toDF("a", "b", "c"), Seq("a", "b", "c"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(3))
      .toMap
    val cols = Seq(rows.map(_._1), rows.map(_._2), rows.map(_._3))
    val names = Seq("a", "b", "c")
    val n = BigInt(rows.size)
    for (i <- 0 until 3; j <- i until 3) {
      val (x, y) = (cols(i), cols(j))
      val num = (n * x.zip(y).map { case (u, v) => BigInt(u) * BigInt(v) }.sum -
        x.map(BigInt(_)).sum * y.map(BigInt(_)).sum).toDouble
      val expect = math.rint(num / (n * (n - 1)).toDouble * 1e6) / 1e6
      assert(got((names(i), names(j))) == expect, s"${names(i)},${names(j)}")
    }
    assert(got.size == 6)
  }

  // ---------------------------------------------------- exactQuantiles

  test("exactQuantiles: equals the built-in percentile() at 6 dp on random data") {
    val rng = new scala.util.Random(19L)
    // heavy ties + negatives + fractional values across several buckets
    val vals = Seq.fill(500)(math.floor(rng.nextGaussian() * 300) / 100.0)
    val df = vals.toDF("v")
    val qs = Seq(0.0, 0.01, 0.25, 0.5, 0.75, 0.99, 1.0)
    val got = Stats.exactQuantiles(df, "v", qs)
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    val expect = qs.map { q =>
      q -> df.agg(round(expr(s"percentile(v, $q)"), 6)).collect()(0).getDouble(0)
    }.toMap
    assert(got == expect, s"got $got expect $expect")
  }

  test("exactQuantiles: n=1, empty input, and guards") {
    val one = Seq(42.5).toDF("v")
    val r1 = Stats.exactQuantiles(one, "v", Seq(0.5)).collect()
    assert(r1.length == 1 && r1(0).getDouble(1) == 42.5)
    assert(Stats.exactQuantiles(one.where(col("v") < 0), "v", Seq(0.5))
      .collect().isEmpty)
    intercept[IllegalArgumentException] {
      Stats.exactQuantiles(one, "v", Seq(1.5)) }
    intercept[IllegalArgumentException] {
      Stats.exactQuantiles(one, "v", Seq(0.5, 0.5)) }
    intercept[IllegalArgumentException] { Stats.exactQuantiles(one, "v", Nil) }
  }

  test("exactQuantiles plan: the data-sized window stays partitioned") {
    val plan = Stats.exactQuantiles(Seq(1.0, 2.0).toDF("v"), "v", Seq(0.5))
      .queryExecution.executedPlan.toString
    assert("hashpartitioning\\(__bk".r.findFirstIn(plan).isDefined,
      s"per-value window lost its bucket partitioning:\n$plan")
  }

  // ------------------------------------------------------------ welchT

  test("welchT: driver replica; identical groups give t=0; degenerate groups null out") {
    val rng = new scala.util.Random(23L)
    val rows = Seq.fill(200)(
      (if (rng.nextBoolean()) "a" else "b", rng.nextInt(1000).toLong))
    val r = Stats.welchT(rows.toDF("g", "v"), "g", "v", "a", "b").collect()(0)
    val xa = rows.filter(_._1 == "a").map(_._2)
    val xb = rows.filter(_._1 == "b").map(_._2)
    def mom(x: Seq[Long]) = (x.size.toLong, x.map(BigInt(_)).sum,
      x.map(v => BigInt(v) * BigInt(v)).sum)
    val (na, sa, qa) = mom(xa); val (nb, sb, qb) = mom(xb)
    def vr(n: Long, s: BigInt, q: BigInt) =
      (BigInt(n) * q - s * s).toDouble / (BigInt(n) * BigInt(n - 1)).toDouble
    val (va, vb) = (vr(na, sa, qa), vr(nb, sb, qb))
    val se2 = va / na + vb / nb
    val ma = sa.toDouble / na; val mb = sb.toDouble / nb
    assert(r.getLong(0) == na && r.getLong(1) == nb)
    assert(r.getDouble(2) == math.rint(ma * 1e6) / 1e6)
    assert(r.getDouble(4) == math.rint((ma - mb) / math.sqrt(se2) * 1e6) / 1e6)
    val dfw = se2 * se2 / ((va / na) * (va / na) / (na - 1.0) +
      (vb / nb) * (vb / nb) / (nb - 1.0))
    assert(r.getDouble(5) == math.rint(dfw * 1e6) / 1e6)
    // constant-valued groups: se2 = 0 -> null t/df, means still reported
    val const = Seq(("a", 5L), ("a", 5L), ("b", 5L), ("b", 5L))
    val rc = Stats.welchT(const.toDF("g", "v"), "g", "v", "a", "b").collect()(0)
    assert(rc.getDouble(2) == 5.0 && rc.isNullAt(4) && rc.isNullAt(5))
  }

  // ------------------------------------------------------ benfordAudit

  test("benfordAudit: hand-computed digits incl. absent-digit zero rows") {
    // values scale=1 -> integers 1, 19, 190, 2, 2, 35; digits 1,1,1,2,2,3
    val df = Seq(1.0, 19.0, 190.0, 2.0, 2.4, 35.0, 0.0, -1.9).toDF("v")
    // -1.9 -> abs 1.9 -> floor 1 -> digit 1; 0.0 excluded
    val got = graft.functions.Profiling.benfordAudit(df, "v", scale = 1L)
      .collect().map(r => r.getInt(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got.size == 9)
    assert(got(1)._1 == 4L && got(2)._1 == 2L && got(3)._1 == 1L)
    assert((4 to 9).forall(got(_)._1 == 0L))
    assert(got(1)._2 == math.rint(4.0 / 7.0 * 1e6) / 1e6)
    val p1 = math.log10(2.0)
    val chi1 = graft.functions.Profiling.benfordAudit(df, "v", 1L)
      .where(col("digit") === 1).collect()(0).getDouble(4)
    assert(chi1 == math.rint((4.0 - 7 * p1) * (4.0 - 7 * p1) / (7 * p1) * 1e6) / 1e6)
    intercept[IllegalArgumentException] {
      graft.functions.Profiling.benfordAudit(df, "v", 0L) }
  }

  test("covMatrix: n < 2 nulls; guards fire; ONE aggregate over one scan") {
    val one = Seq((1L, 2L)).toDF("a", "b")
    val r = Stats.covMatrix(one, Seq("a", "b")).collect()
    assert(r.forall(_.isNullAt(3)))
    intercept[IllegalArgumentException] { Stats.covMatrix(one, Nil) }
    intercept[IllegalArgumentException] { Stats.covMatrix(one, Seq("a", "a")) }
    val plan = Stats.covMatrix(one, Seq("a", "b"))
      .queryExecution.executedPlan.toString
    assert("Exchange".r.findAllIn(plan).size <= 1, // single final-agg exchange
      s"covMatrix should be one aggregate:\n$plan")
  }

  // ------------------------------------------- chiSquareIndependence

  test("chiSquareIndependence: hand-computed 2x2 table; null rows excluded") {
    val rows = Seq.fill(10)(("x", "u")) ++ Seq.fill(20)(("x", "v")) ++
      Seq.fill(30)(("y", "u")) ++ Seq.fill(40)(("y", "v")) ++
      Seq((null.asInstanceOf[String], "u"), ("x", null.asInstanceOf[String]))
    val r = Stats.chiSquareIndependence(rows.toDF("a", "b"), "a", "b")
      .collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((100L, 2L, 2L, 1L)))
    // per-cell (o-e)^2/e rounded 6 dp, then the exact decimal sum
    val terms = Seq((10.0, 12.0), (20.0, 18.0), (30.0, 28.0), (40.0, 42.0))
      .map { case (o, e) => math.rint((o - e) * (o - e) / e * 1e6) / 1e6 }
    val chi2 = terms.map(BigDecimal(_)).sum.toDouble
    assert(r.getDouble(4) == chi2)
    assert(r.getDouble(5) ==
      math.rint(math.sqrt(r.getDouble(4) / 100.0) * 1e6) / 1e6)
  }

  test("chiSquareIndependence: proportional table scores zero; dof 0 nulls cramers_v") {
    val prop = Seq.fill(10)(("x", "u")) ++ Seq.fill(20)(("x", "v")) ++
      Seq.fill(20)(("y", "u")) ++ Seq.fill(40)(("y", "v"))
    val r = Stats.chiSquareIndependence(prop.toDF("a", "b"), "a", "b")
      .collect()(0)
    assert(r.getDouble(4) == 0.0 && r.getDouble(5) == 0.0)
    val flat = Seq(("x", "u"), ("x", "v")).toDF("a", "b")
    val r2 = Stats.chiSquareIndependence(flat, "a", "b").collect()(0)
    assert(r2.getLong(3) == 0L && r2.isNullAt(5))
  }

  // ----------------------------------------------- mutualInformation

  test("mutualInformation: zero under independence, equals entropy under identity") {
    val ind = (Seq.fill(10)(("x", "u")) ++ Seq.fill(10)(("x", "v")) ++
      Seq.fill(10)(("y", "u")) ++ Seq.fill(10)(("y", "v"))).toDF("a", "b")
    val r = Stats.mutualInformation(ind, "a", "b").collect()(0)
    assert(r.getLong(0) == 40L && r.getDouble(1) == 0.0)
    // identity: mi == h_a == h_b (uniform 2-way: ln 2 per margin), nmi 1
    val idm = (Seq.fill(5)(("x", "x")) ++ Seq.fill(5)(("y", "y"))).toDF("a", "b")
    val r2 = Stats.mutualInformation(idm, "a", "b").collect()(0)
    val ln2 = math.rint(0.5 * math.log(2.0) * 1e6) / 1e6 * 2 // two 6dp terms
    assert(r2.getDouble(2) == ln2 && r2.getDouble(3) == ln2)
    assert(r2.getDouble(1) == r2.getDouble(2))
    assert(r2.getDouble(4) == 1.0)
  }

  // ------------------------------------------------ calibrationCurve

  test("calibrationCurve: hand bins, top-bin closure, exact means; guard") {
    val df = Seq((0.05, true), (0.15, false), (0.17, true), (1.0, true),
      (0.999999, false)).toDF("score", "y")
    val got = Stats.calibrationCurve(df, "score", col("y"), 10)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(got(0L) == ((1L, 1L, 0.05, 1.0)))
    assert(got(1L) == ((2L, 1L, 0.16, 0.5)))
    assert(got(9L) == ((2L, 1L, 1.0, 0.5))) // 1.0 and 0.999999 share bin 9
    intercept[IllegalArgumentException] {
      Stats.calibrationCurve(df, "score", col("y"), 1) }
  }

  // --------------------------------------------------------------- cuped

  test("cuped: perfectly predictive covariate collapses arm difference; zero variance degrades to raw means") {
    // y = x + arm-independent noise pattern: theta = 1, adjusted means equal
    val rows = Seq(("a", 10L, 10L), ("a", 20L, 20L), ("b", 30L, 30L),
      ("b", 40L, 40L))
    val got = Stats.cuped(rows.toDF("arm", "y", "x"), "arm", "y", "x")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(got("a")._4 == 1.0 && got("b")._4 == 1.0) // theta
    assert(got("a")._3 == got("b")._3) // adjusted means collapse to pooled
    assert(got("a")._2 == 15.0 && got("b")._2 == 35.0) // raw means intact
    val flat = Seq(("a", 10L, 5L), ("b", 30L, 5L)).toDF("arm", "y", "x")
    val g2 = Stats.cuped(flat, "arm", "y", "x")
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(g2 == Map("a" -> 10.0, "b" -> 30.0)) // theta 0 -> raw means
  }

  // ------------------------------------------------------------ srmCheck

  test("srmCheck: hand chi2, absent designed arm counts zero, off-design arms ignored; guards") {
    val df = (Seq.fill(60)("a") ++ Seq.fill(40)("b") ++ Seq.fill(7)("zz"))
      .toDF("arm")
    val r = Stats.srmCheck(df, "arm", Seq("a" -> 0.5, "b" -> 0.5)).collect()(0)
    // n=100, e=50 each: (60-50)^2/50 + (40-50)^2/50 = 2 + 2 = 4
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)) ==
      ((100L, 2L, 1L, 4.0)))
    val r2 = Stats.srmCheck(df, "arm",
      Seq("a" -> 1.0, "b" -> 1.0, "c" -> 2.0)).collect()(0)
    // n=100, e = 25/25/50; c absent: (60-25)^2/25+(40-25)^2/25+(0-50)^2/50
    assert(r2.getDouble(3) == 49.0 + 9.0 + 50.0)
    intercept[IllegalArgumentException] { Stats.srmCheck(df, "arm", Nil) }
    intercept[IllegalArgumentException] {
      Stats.srmCheck(df, "arm", Seq("a" -> 0.5, "a" -> 0.5)) }
    intercept[IllegalArgumentException] {
      Stats.srmCheck(df, "arm", Seq("a" -> 0.0)) }
  }

  // ---------------------------------------------------- exactQuantilesBy

  test("exactQuantilesBy: equals the built-in percentile per group at 6 dp; guards") {
    val rng = new scala.util.Random(13L)
    val rows = for (g <- Seq("g1", "g2", "g3"); _ <- 1 to 120)
      yield (g, (rng.nextInt(500) - 250).toDouble)
    val df = rows.toDF("g", "v")
    val qs = Seq(0.0, 0.1, 0.5, 0.9, 1.0)
    val got = Stats.exactQuantilesBy(df, Seq("g"), "v", qs)
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2))
      .toMap
    val expect = df.groupBy("g")
      .agg(expr(s"percentile(v, array(${qs.mkString(",")}))").as("p"))
      .collect().flatMap(r => qs.zip(r.getSeq[Double](1))
        .map { case (q, v) => (r.getString(0), q) ->
          math.rint(v * 1e6) / 1e6 }).toMap
    assert(got == expect)
    intercept[IllegalArgumentException] {
      Stats.exactQuantilesBy(df, Nil, "v", qs) }
    intercept[IllegalArgumentException] {
      Stats.exactQuantilesBy(df, Seq("g"), "v", Seq(1.5)) }
    intercept[IllegalArgumentException] {
      Stats.exactQuantilesBy(df, Seq("g"), "v", Seq(0.5, 0.5)) }
  }

  test("exactQuantilesBy plan: windows stay partitioned by the group key") {
    val df = Seq(("g", 1.0), ("g", 2.0)).toDF("g", "v")
    val plan = Stats.exactQuantilesBy(df, Seq("g"), "v", Seq(0.5))
      .queryExecution.executedPlan.toString
    // every Window in the plan must carry a partition spec
    "windowspecdefinition\\(([^,]*)".r.findAllMatchIn(plan).foreach { m =>
      assert(!m.group(1).trim.startsWith("v"),
        s"unpartitioned window over data:\n$plan")
    }
  }

  // ------------------------------------------------------------------ psi

  test("psi: identical samples score zero; shifted mass is positive; clamping and guards") {
    val ref = (1 to 100).map(i => (i % 10).toDouble).toDF("v")
    val same = (1 to 100).map(i => (i % 10).toDouble).toDF("v")
    val r0 = Stats.psi(ref, same, "v", 0.0, 10.0, 10).collect()(0)
    assert((r0.getLong(0), r0.getLong(1), r0.getDouble(2)) == ((100L, 100L, 0.0)))
    val shifted = (1 to 100).map(i => (i % 10) + 500.0).toDF("v") // clamps to top bin
    val r1 = Stats.psi(ref, shifted, "v", 0.0, 10.0, 10).collect()(0)
    assert(r1.getDouble(2) > 1.0)
    intercept[IllegalArgumentException] { Stats.psi(ref, same, "v", 0.0, 10.0, 1) }
    intercept[IllegalArgumentException] { Stats.psi(ref, same, "v", 5.0, 5.0, 10) }
  }

  // ------------------------------------------------------ lagCorrelation

  test("lagCorrelation: perfect lag-1 shift, zero-variance null, guards") {
    // y is x shifted by one grid step: corr at lag 1 is exactly 1
    val xs = Seq(3L, 1L, 4L, 1L, 5L, 9L, 2L, 6L)
    val rows = xs.indices.map(i =>
      (i.toLong, xs(i), if (i >= 1) xs(i - 1) else 0L))
    // y_t = x_{t-1}  =>  corr(x_t, y_{t+1}) = 1 at lag 1
    val got = Stats.lagCorrelation(rows.toDF("t", "x", "y"), "t", "x", "y", 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), if (r.isNullAt(2)) None else Some(r.getDouble(2)))))
      .toMap
    assert(got(1L)._2 == Some(1.0))
    assert(got(0L)._1 == 8L && got(1L)._1 == 7L && got(2L)._1 == 6L)
    val const = (0L to 5L).map(t => (t, 7L, t)).toDF("t", "x", "y")
    val g2 = Stats.lagCorrelation(const, "t", "x", "y", 0).collect()(0)
    assert(g2.isNullAt(2)) // zero x-variance
    intercept[IllegalArgumentException] {
      Stats.lagCorrelation(const, "t", "x", "y", -1) }
  }

  // ---------------------------------------------------------- kAnonymity

  test("kAnonymity: hand rollup, nulls group together, guards") {
    val rows = Seq.fill(6)(("a", 1L)) ++ Seq.fill(2)(("b", 1L)) ++
      Seq(("c", 2L)) ++ Seq.fill(3)((null.asInstanceOf[String], 9L))
    val r = graft.functions.Profiling.kAnonymity(
      rows.toDF("qa", "qb"), Seq("qa", "qb"), 5L).collect()(0)
    // groups: (a,1)=6 ok, (b,1)=2 viol, (c,2)=1 viol, (null,9)=3 viol
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((12L, 4L, 1L, 3L)))
    assert(r.getDouble(4) == 0.5) // 6 of 12 rows at risk
    intercept[IllegalArgumentException] {
      graft.functions.Profiling.kAnonymity(rows.toDF("qa", "qb"), Nil, 5L) }
    intercept[IllegalArgumentException] {
      graft.functions.Profiling.kAnonymity(rows.toDF("qa", "qb"), Seq("qa"), 1L) }
  }

  // ------------------------------------------------------ paretoFrontier2d

  test("paretoFrontier2d: equals the brute dominance filter; duplicates keep min id; no global window") {
    val rng = new scala.util.Random(23L)
    val rows = (1L to 300L).map(id =>
      (id, (rng.nextInt(1000) / 10.0), rng.nextInt(50).toLong)) ++
      Seq((900L, 5.5, 40L), (901L, 5.5, 40L)) // exact duplicate pair
    val df = rows.toDF("id", "price", "size")
    val got = Stats.paretoFrontier2d(df, "id", "price", "size")
      .collect().map(_.getLong(0)).toSet
    val brute = rows.filter { case (id, p, s) =>
      !rows.exists { case (_, p2, s2) =>
        p2 <= p && s2 >= s && (p2 < p || s2 > s) } &&
      !rows.exists { case (id2, p2, s2) => p2 == p && s2 == s && id2 < id }
    }.map(_._1).toSet
    assert(got == brute, s"got $got expected $brute")
    val plan = Stats.paretoFrontier2d(df, "id", "price", "size")
      .queryExecution.executedPlan.toString
    // the data-sized frame only sees the bucket-PARTITIONED window; the
    // one-task scan runs on the bucket-totals frame alone
    assert(graft.plans.PlanAudit.audit(
      Stats.paretoFrontier2d(df, "id", "price", "size")).scaleSafe(
        allowNestedLoop = true))
    assert(plan.contains("windowspecdefinition(__bk"),
      s"expected bucket-partitioned window:\n$plan")
  }

  test("paretoFrontier2d: fractional maxCol compares exactly (no long truncation)") {
    // (min=1, max=1.2) and (min=2, max=1.9): neither dominates the other —
    // a long cast would truncate both maxima to 1 and wrongly drop id 2
    val df = Seq((1L, 1.0, 1.2), (2L, 2.0, 1.9), (3L, 3.0, 1.9),
      (4L, 0.5, 0.7)).toDF("id", "price", "size")
    val got = Stats.paretoFrontier2d(df, "id", "price", "size")
      .collect().map(_.getLong(0)).toSet
    // id 3 is dominated by id 2 (higher min, equal max); id 4 non-dominated
    assert(got == Set(1L, 2L, 4L), got.toString)
  }
}
