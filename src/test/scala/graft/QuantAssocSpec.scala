package graft

import org.apache.spark.sql.functions._
import graft.functions.{EventOps, Profiling, Similarity, TextFunctions => TF}

/** Round-8 batch 2: product quantization, exact KS test, association
  * rules, unigram KL, streaming sketches. */
class QuantAssocSpec extends SparkSuite {
  import spark.implicits._

  // ---------------------------------------------------------------- PQ

  test("productQuantize: hand codebook, exact codes and error") {
    // dim 4, m=2 (subspaces of 2 dims); anchors = identity-ish corners
    val anchors = Seq(
      1L -> Array(0.0, 0.0, 0.0, 0.0),
      2L -> Array(1.0, 1.0, 1.0, 1.0),
      3L -> Array(0.0, 0.0, 1.0, 1.0))
    val df = Seq(
      (10L, Seq(0.1, 0.0, 1.0, 1.0)), // sub0 -> anchor0 (d=.01), sub1 -> anchor1/2 (d=0) tie -> j=1
      (11L, Seq(1.0, 1.0, 0.0, 0.0))  // sub0 -> anchor1 (d=0), sub1 -> anchor0 (d=0)
    ).toDF("vec_id", "embedding")
    val got = Similarity.productQuantize(df, anchors, 2).collect()
      .map(r => r.getLong(0) -> ((r.getSeq[Int](1), r.getDouble(2)))).toMap
    assert(got(10L)._1 == Seq(0, 1))
    assert(got(10L)._2 == 0.01) // round(0.1^2,4) + 0 = 0.01
    assert(got(11L) == ((Seq(1, 0), 0.0)))
  }

  test("productQuantize: ties go to the lowest codebook index; guards fire") {
    val anchors = Seq(1L -> Array(1.0, 0.0), 2L -> Array(1.0, 0.0))
    val df = Seq((1L, Seq(1.0, 0.0))).toDF("vec_id", "embedding")
    val got = Similarity.productQuantize(df, anchors, 1).collect()(0)
    assert(got.getSeq[Int](1) == Seq(0))
    intercept[IllegalArgumentException] {
      Similarity.productQuantize(df, anchors, 3) } // 2 % 3 != 0
    intercept[IllegalArgumentException] {
      Similarity.productQuantize(df, Nil, 1) }
  }

  test("productQuantize plan: zero shuffle (codebooks are literals)") {
    val anchors = Seq(1L -> Array(1.0, 0.0))
    val df = Seq((1L, Seq(1.0, 0.0))).toDF("vec_id", "embedding")
    val plan = Similarity.productQuantize(df, anchors, 1)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"))
  }

  // ------------------------------------------------------------- KS test

  test("ksTest: hand-computed D on small samples, integer numerator") {
    // A = {1,2,3}, B = {3,4,5}: max |F_A - F_B| at v in [3,4): |3/3 - 1/3| = 2/3
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0),
      ("b", 3.0), ("b", 4.0), ("b", 5.0)).toDF("g", "v")
    val r = Profiling.ksTest(df, "g", "v", "a", "b").collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((3L, 3L, 6L)))
    assert(r.getDouble(3) == BigDecimal(6.0 / 9.0)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("ksTest: identical samples give D = 0; disjoint give D = 1") {
    val same = Seq(("a", 1.0), ("a", 2.0), ("b", 1.0), ("b", 2.0)).toDF("g", "v")
    assert(Profiling.ksTest(same, "g", "v", "a", "b")
      .collect()(0).getDouble(3) == 0.0)
    val disj = Seq(("a", 1.0), ("a", 2.0), ("b", 10.0), ("b", 11.0)).toDF("g", "v")
    assert(Profiling.ksTest(disj, "g", "v", "a", "b")
      .collect()(0).getDouble(3) == 1.0)
  }

  test("ksTest is invariant to partitioning and matches a driver-side replica") {
    val rows = (1L to 400L).map { i =>
      (if (i % 2 == 0) "a" else "b", (i * 37 % 97).toDouble + (i % 5) * 0.25)
    }
    val df = rows.toDF("g", "v")
    def replica(): (Long, Long, Long) = {
      val a = rows.filter(_._1 == "a").map(_._2).sorted
      val b = rows.filter(_._1 == "b").map(_._2).sorted
      val vs = (a ++ b).distinct.sorted
      val dn = vs.map(v =>
        math.abs(a.count(_ <= v).toLong * b.length - b.count(_ <= v).toLong * a.length)).max
      (a.length.toLong, b.length.toLong, dn)
    }
    val (na, nb, dn) = replica()
    for (d <- Seq(df, df.repartition(13))) {
      val r = Profiling.ksTest(d, "g", "v", "a", "b").collect()(0)
      assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((na, nb, dn)))
    }
  }

  // ------------------------------------------------------- association

  test("associationPairs: hand-computed support/confidence/lift; duplicate events collapse") {
    val ev = Seq(
      (1L, "x"), (1L, "x"), (1L, "y"), // dup (1,x) must not double-count
      (2L, "x"), (2L, "y"),
      (3L, "x"),
      (4L, "z")).toDF("u", "it")
    val got = EventOps.associationPairs(ev, "u", "it").collect()
      .map(r => (r.getString(r.fieldIndex("x")), r.getString(r.fieldIndex("y"))) -> r).toMap
    assert(got.keySet == Set(("x", "y")))
    val r = got(("x", "y"))
    assert(r.getLong(r.fieldIndex("n_x")) == 3L)
    assert(r.getLong(r.fieldIndex("n_y")) == 2L)
    assert(r.getLong(r.fieldIndex("n_xy")) == 2L)
    assert(r.getDouble(r.fieldIndex("support")) == 0.5)      // 2/4
    assert(r.getDouble(r.fieldIndex("confidence")) == BigDecimal(2.0 / 3.0)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(r.getDouble(r.fieldIndex("lift")) == BigDecimal(8.0 / 6.0)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  // ---------------------------------------------------------------- KL

  test("unigramKl: zero for a group matching the blend, positive for a skewed one") {
    // two groups with identical distributions -> corpus == each -> KL = 0
    val same = Seq(("g1", "a b"), ("g2", "a b")).toDF("src", "text")
    val z = TF.unigramKl(same, "src", "text").collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(z("g1") == 0.0 && z("g2") == 0.0)
    // skewed: g1 all-a, g2 all-b -> p=1, q=1/2 -> KL = ln 2 each
    val skew = Seq(("g1", "a a"), ("g2", "b b")).toDF("src", "text")
    val k = TF.unigramKl(skew, "src", "text").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val ln2r = BigDecimal(math.log(2.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(k("g1") == ((1L, ln2r)) && k("g2") == ((1L, ln2r)))
  }

  // ----------------------------------------------------------- survival

  test("survivalCurve: textbook KM hand case with censoring") {
    // durations: events at 2 (1x), 4 (1x); censored at 3, 5.
    // t=2: n=4, d=1 -> S = 3/4. t=4: n=2, d=1 -> S = 3/4 * 1/2 = 3/8.
    val df = Seq((2L, 1L), (3L, 0L), (4L, 1L), (5L, 0L)).toDF("dur", "ev")
    val got = EventOps.survivalCurve(df, "dur", "ev").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    def km(fs: Seq[Double]): Double = {
      val lnsum = fs.map(f => BigDecimal(math.log(f))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble).sum
      BigDecimal(math.exp(lnsum))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    assert(got == Map(2L -> ((4L, 1L, km(Seq(0.75)))),
      4L -> ((2L, 1L, km(Seq(0.75, 0.5))))))
  }

  test("survivalCurve: everyone failing at the last time zeroes the tail, no ln(0)") {
    val df = Seq((1L, 1L), (2L, 1L), (2L, 1L)).toDF("dur", "ev")
    val got = EventOps.survivalCurve(df, "dur", "ev").collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(got(2L) == 0.0 && got(1L) > 0.0)
  }

  test("survivalCurve is monotone non-increasing and partitioning-invariant") {
    val rows = (1L to 500L).map(i => ((i * 13 % 40) + 1, (i % 3 != 0)))
      .map { case (d, e) => (d, if (e) 1L else 0L) }
    val df = rows.toDF("dur", "ev")
    val a = EventOps.survivalCurve(df, "dur", "ev")
      .orderBy("t").collect().map(r => (r.getLong(0), r.getDouble(3)))
    val b = EventOps.survivalCurve(df.repartition(11), "dur", "ev")
      .orderBy("t").collect().map(r => (r.getLong(0), r.getDouble(3)))
    assert(a.sameElements(b))
    assert(a.map(_._2).sliding(2).forall(p => p.length < 2 || p(0) >= p(1)))
  }

  // --------------------------------------------------------- winsorized

  test("winsorizedMean: clip bounds respected, outlier influence capped") {
    val df = ((1L to 99L).map(i => ("a", (i % 10).toDouble)) :+ (("a", 1e9)))
      .toDF("g", "value")
    val r = Profiling.winsorizedMean(df, Seq("g"), "value").collect()(0)
    val phi = r.getDouble(r.fieldIndex("p_hi"))
    assert(r.getDouble(r.fieldIndex("wmean")) <= phi)
    assert(phi < 1e6) // the p95 clip killed the 1e9 outlier
    intercept[IllegalArgumentException] {
      Profiling.winsorizedMean(df, Seq("g"), "value", 0.9, 0.1) }
  }

  test("unigramKl is invariant to partitioning (decimal term sums)") {
    val df = (1L to 300L)
      .map(i => (s"s${i % 3}", s"w${i % 7} w${i % 11} w${i % 13}"))
      .toDF("src", "text")
    val a = TF.unigramKl(df, "src", "text").collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    val b = TF.unigramKl(df.repartition(17), "src", "text").collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(a == b && a.values.forall(_ >= 0.0))
  }
}
