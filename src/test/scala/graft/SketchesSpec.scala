package graft

import org.apache.spark.sql.functions._
import graft.functions.{Sketches, TextFunctions => TF}

class SketchesSpec extends SparkSuite {
  import spark.implicits._

  /** A multiset with known counts: value v_i repeated i+1 times, 200 values. */
  lazy val multiset = {
    (0 until 200).flatMap(i => Seq.fill(i % 7 + 1)(s"v$i")).toDF("v")
  }
  lazy val trueCounts: Map[String, Long] =
    (0 until 200).map(i => s"v$i" -> (i % 7 + 1).toLong).toMap

  // ---------------------------------------------------------------- count-min

  test("CMS: estimate >= true count for every value (the one-sided guarantee)") {
    val sk = Sketches.cmsSketch(multiset, "v", depth = 4, width = 32, salt = "t")
    val probe = multiset.distinct()
    val est = Sketches.cmsLookup(sk, probe, "v", 4, 32, "t").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est.keySet == trueCounts.keySet)
    trueCounts.foreach { case (v, c) =>
      assert(est(v) >= c, s"$v: est ${est(v)} < true $c")
    }
    // a tight sketch must actually collide somewhere at 200 keys / 32 buckets
    assert(trueCounts.exists { case (v, c) => est(v) > c })
  }

  test("CMS: wide sketch with no collisions is exact; absent values estimate 0") {
    // width >> values: overestimates only on bucket collisions, which we
    // can detect and exclude deterministically
    val sk = Sketches.cmsSketch(multiset, "v", depth = 4, width = 8192, salt = "t")
    val est = Sketches.cmsLookup(sk, multiset.distinct(), "v", 4, 8192, "t")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = trueCounts.count { case (v, c) => est(v) == c }
    assert(exact >= 190, s"only $exact/200 exact at width 8192")
    // absent values: every cell they hash to is either empty (0) or a
    // collision — with width 8192 expect mostly 0
    val absent = Seq("absent-a", "absent-b", "absent-c").toDF("v")
    val ae = Sketches.cmsLookup(sk, absent, "v", 4, 8192, "t").collect()
      .map(_.getLong(1))
    assert(ae.forall(_ >= 0) && ae.min == 0)
  }

  test("CMS: sketch is a deterministic function of the input multiset") {
    val a = Sketches.cmsSketch(multiset, "v", 4, 64, "t")
    val b = Sketches.cmsSketch(multiset.repartition(13), "v", 4, 64, "t")
    assertSameRows(a, b)
  }

  // -------------------------------------------------------------- HyperLogLog

  test("HLL: estimate lands within the expected error band") {
    val n = 5000
    val vals = (0 until n).map(i => s"item$i").toDF("v")
    val est = Sketches.hllEstimate(Sketches.hllSketch(vals, "v", p = 8, "t"), 8)
      .collect()(0).getDouble(2)
    // sigma ~ 1.04/sqrt(256) = 6.5%; 3 sigma = 20%
    assert(math.abs(est - n) / n < 0.20, s"est $est vs $n")
  }

  test("HLL: registers are a max-merge — union sketch == merged sketches") {
    val a = (0 until 1000).map(i => s"a$i").toDF("v")
    val b = (500 until 1500).map(i => s"a$i").toDF("v")
    val union = Sketches.hllSketch(a.union(b), "v", 8, "t")
    val merged = Sketches.hllSketch(a, "v", 8, "t")
      .union(Sketches.hllSketch(b, "v", 8, "t"))
      .groupBy("register").agg(max("rho").as("rho"))
    assertSameRows(union, merged)
  }

  test("HLL: duplicates don't move the sketch (distinct semantics)") {
    val once = (0 until 300).map(i => s"d$i").toDF("v")
    val thrice = (0 until 300).flatMap(i => Seq.fill(3)(s"d$i")).toDF("v")
    assertSameRows(
      Sketches.hllSketch(once, "v", 8, "t"),
      Sketches.hllSketch(thrice, "v", 8, "t"))
  }

  test("HLL: register/rho replay the md5 hash bit-for-bit") {
    val vals = Seq("alpha", "beta", "gamma").toDF("v")
    val got = Sketches.hllSketch(vals, "v", p = 8, salt = "t").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val md = java.security.MessageDigest.getInstance("MD5")
    val expect = Seq("alpha", "beta", "gamma").map { s =>
      val h = TF.md5H60(md, s"hll:t:$s")
      val reg = h & 255L
      val suffix = h >>> 8
      val bitlen = if (suffix == 0L) 0 else 64 - java.lang.Long.numberOfLeadingZeros(suffix)
      reg -> (60 - 8 + 1 - bitlen)
    }.groupBy(_._1).map { case (r, xs) => r -> xs.map(_._2).max }
    expect.foreach { case (r, rho) => assert(got(r) == rho, s"register $r") }
  }

  test("HLL: small-range correction engages on tiny cardinalities") {
    val vals = Seq("x", "y", "z").toDF("v")
    val row = Sketches.hllEstimate(Sketches.hllSketch(vals, "v", 8, "t"), 8)
      .collect()(0)
    val est = row.getDouble(2)
    // linear counting at V = 253 zero registers: m ln(m/V) ~ 3.01
    assert(row.getLong(1) >= 250, s"n_zero ${row.getLong(1)}")
    assert(est > 2.0 && est < 4.5, s"est $est for 3 distinct")
  }

  // ------------------------------------------------------------- Bloom filter

  // ------------------------------------------------------------ heavy hitters

  test("heavy hitters: exact set and counts for every threshold share") {
    // skewed multiset: "big" 60x, "mid" 20x, the rest 1-7x (total 305)
    val rows = Seq.fill(60)("big") ++ Seq.fill(20)("mid") ++
      (0 until 200).flatMap(i => Seq.fill(i % 7 + 1)(s"v$i"))
    val df = rows.toDF("v")
    val total = rows.size
    for (div <- Seq(2L, 10L, 50L, 300L)) {
      val got = Sketches.heavyHittersByShare(df, "v", div, 4, 16, "t")
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val thr = total / div
      val want = rows.groupBy(identity).map { case (v, xs) => v -> xs.size.toLong }
        .filter(_._2 >= thr)
      assert(got == want, s"divisor $div (threshold $thr)")
    }
  }

  test("heavy hitters: tight sketch (many collisions) still yields the exact answer") {
    // width 2 x depth 1: nearly everything collides — false positives must
    // be discarded by the exact pass, no false negatives possible
    val rows = Seq.fill(50)("hot") ++ (0 until 100).map(i => s"v$i")
    val got = Sketches.heavyHittersByShare(rows.toDF("v"), "v", 10L,
      depth = 1, width = 2, salt = "t").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("hot" -> 50L)) // threshold = 150/10 = 15
  }

  test("heavy hitters: result invariant to partitioning") {
    val rows = Seq.fill(30)("a") ++ Seq.fill(10)("b") ++ (0 until 60).map(i => s"v$i")
    val one = Sketches.heavyHittersByShare(rows.toDF("v"), "v", 5L)
      .collect().map(_.toSeq).toSet
    val many = Sketches.heavyHittersByShare(rows.toDF("v").repartition(13), "v", 5L)
      .collect().map(_.toSeq).toSet
    assert(one == many && one.nonEmpty)
  }

  test("Bloom: no false negatives, ever") {
    val corpus = (0 until 500).map(i => s"doc$i").toDF("v")
    val bits = Sketches.bloomBits(corpus, "v", numBits = 8192L, k = 3, "t")
    val probed = Sketches.bloomProbe(bits, corpus, "v", 8192L, 3, "t")
    assert(probed.where(!col("present")).count() == 0)
  }

  test("Bloom: false-positive rate near the design point") {
    val corpus = (0 until 500).map(i => s"doc$i").toDF("v")
    val bits = Sketches.bloomBits(corpus, "v", 8192L, 3, "t")
    val absent = (0 until 1000).map(i => s"other$i").toDF("v")
    val fp = Sketches.bloomProbe(bits, absent, "v", 8192L, 3, "t")
      .where(col("present")).count()
    // (1 - e^(-3*500/8192))^3 ~ 0.0042 -> expect ~4 of 1000; allow <= 25
    assert(fp <= 25, s"fp=$fp of 1000")
  }

  test("Bloom probe: one output row per probe row (duplicates preserved), no shuffle, reserved names rejected") {
    val corpus = (0 until 100).map(i => s"doc$i").toDF("v")
    val bits = Sketches.bloomBits(corpus, "v", 4096L, 3, "t")
    val dup = Seq("doc1", "doc1", "absent-val").toDF("v")
    val got = Sketches.bloomProbe(bits, dup, "v", 4096L, 3, "t")
    assert(got.count() == 3, "duplicate probe rows must not collapse")
    assert(got.where(col("v") === "doc1" && col("present")).count() == 2)
    // probe plan: k broadcast hash joins — the probe stream is never
    // shuffled or aggregated (the only Exchange is inside the bit-table
    // build under the BroadcastExchange)
    val plan = got.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && !plan.contains("SortMergeJoin"),
      s"probe must stream through broadcast joins:\n$plan")
    val e = intercept[IllegalArgumentException] {
      Sketches.bloomProbe(bits, dup.withColumn("pos", lit(1)), "v", 4096L, 3, "t")
    }
    assert(e.getMessage.contains("reserves"))
  }

  test("Bloom: the bit table is small and merges by union") {
    val a = (0 until 100).map(i => s"a$i").toDF("v")
    val b = (0 until 100).map(i => s"b$i").toDF("v")
    val ua = Sketches.bloomBits(a, "v", 4096L, 3, "t")
    val ub = Sketches.bloomBits(b, "v", 4096L, 3, "t")
    assert(ua.count() <= 300)
    assertSameRows(
      Sketches.bloomBits(a.union(b), "v", 4096L, 3, "t"),
      ua.union(ub).distinct())
  }

  test("hllSketchGrouped/hllEstimateGrouped: per-group estimate tracks exact; merge = max") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = (1 to 2000).map(i => (s"g${i % 3}", s"v${i % (40 * (i % 3 + 1))}"))
      .toDF("g", "v")
    val sk = Sketches.hllSketchGrouped(df, Seq("g"), "v", 10, "t")
    val est = Sketches.hllEstimateGrouped(sk, Seq("g"), 10).collect()
      .map(r => r.getString(0) -> r.getDouble(r.fieldIndex("est"))).toMap
    val exact = df.distinct().groupBy("g").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (g, ex) =>
      assert(math.abs(est(g) - ex) / ex < 0.15, s"$g: est ${est(g)} vs $ex")
    }
    // grouped sketch of a union == per-frame sketches max-merged
    def skOf(d: org.apache.spark.sql.DataFrame) =
      Sketches.hllSketchGrouped(d, Seq("g"), "v", 10, "t")
    val (d1, d2) = (df.limit(900), df.exceptAll(df.limit(900)))
    val merged = skOf(d1).unionAll(skOf(d2))
      .groupBy("g", "register").agg(max("rho").as("rho"))
      .collect().map(r => (s"${r.get(0)}", s"${r.get(1)}") -> s"${r.get(2)}").toMap
    val whole = sk.collect()
      .map(r => (s"${r.get(0)}", s"${r.get(1)}") -> s"${r.get(2)}").toMap
    assert(merged == whole)
  }
}
