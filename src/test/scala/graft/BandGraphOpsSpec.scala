package graft

import org.apache.spark.sql.functions._
import graft.operators.BandJoin
import graft.functions.{EventOps, GraphOps, Profiling, TextFunctions => TF}

/** Round-7 additions: bucketed band join, graph kernels (PageRank step,
  * degree-ordered triangle count), deterministic EWMA, robust
  * median/MAD outliers, Gopher rules, tokenizer fertility. */
class BandGraphOpsSpec extends SparkSuite {
  import spark.implicits._

  // ------------------------------------------------------------- band join

  test("bandJoin matches the brute-force theta join exactly") {
    val l = (1L to 60L).map(i => (i, (i * 7 % 23).toDouble / 3.0))
      .toDF("id_a", "va")
    val r = (1L to 60L).map(i => (i + 100, (i * 5 % 19).toDouble / 3.0))
      .toDF("id_b", "vb")
    val got = BandJoin.bandJoin(l, r, "va", 0.5, Nil, Some("vb"))
      .select("id_a", "id_b").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    val want = l.crossJoin(r).where(abs(col("va") - col("vb")) <= 0.5)
      .select("id_a", "id_b").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(got == want && got.nonEmpty)
  }

  test("bandJoin emits each qualifying pair exactly once (no replica dups)") {
    // values straddling bucket boundaries: 0.99 / 1.0 / 1.01 with delta 1.0
    val l = Seq((1L, 0.99), (2L, 1.0), (3L, 1.01)).toDF("id_a", "va")
    val r = Seq((10L, 0.0), (11L, 1.999), (12L, 2.0)).toDF("id_b", "vb")
    val rows = BandJoin.bandJoin(l, r, "va", 1.0, Nil, Some("vb"))
      .select("id_a", "id_b").collect().map(x => (x.getLong(0), x.getLong(1)))
    assert(rows.length == rows.distinct.length)
    // pair (2, 12): |1.0-2.0| = 1.0 <= delta, buckets 1 vs 2 -> caught by ±1
    assert(rows.contains((2L, 12L)))
  }

  test("bandJoin respects equi keys and rejects bad delta / reserved names") {
    val l = Seq(("x", 1L, 5.0), ("y", 2L, 5.0)).toDF("k", "id_a", "va")
    val r = Seq(("x", 3L, 5.2)).toDF("k", "id_b", "vb")
    val got = BandJoin.bandJoin(l, r, "va", 0.5, Seq("k"), Some("vb"))
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 3L))) // y-side pair excluded by the key
    intercept[IllegalArgumentException] {
      BandJoin.bandJoin(l, r, "va", 0.0, Nil, Some("vb")) }
    intercept[IllegalArgumentException] {
      BandJoin.bandJoin(l.withColumn("__band", lit(1)), r, "va", 1.0,
        Nil, Some("vb")) }
  }

  test("bandJoin plan is an equi-join, not a nested loop") {
    val l = Seq((1L, 5.0)).toDF("id_a", "va")
    val r = Seq((2L, 5.2)).toDF("id_b", "vb")
    val plan = BandJoin.bandJoin(l, r, "va", 0.5, Nil, Some("vb"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"))
  }

  // ------------------------------------------------------------- PageRank

  test("pagerankStep: hand-computed two-node ranks, sink handled via left join") {
    // a -> b (w=1). N=2, r0=1/2, d=0.85
    val e = Seq(("a", "b", 1.0)).toDF("s", "d", "w")
    val got = GraphOps.pagerankStep(e, "s", "d", "w").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val d = 0.85
    val expB = BigDecimal((1.0 - d) / 2 + d * (math.floor(1.0 * 0.5 * 1e12) / 1e12))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expA = BigDecimal((1.0 - d) / 2)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got("a") == expA && got("b") == expB)
  }

  test("pagerankStep: uniform ring is a fixed point of the uniform vector") {
    // 4-node ring, each node one out-edge w=1: rank stays 1/4 (up to rounding)
    val e = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("d", "a"))
      .toDF("s", "d").withColumn("w", lit(1.0))
    val got = GraphOps.pagerankStep(e, "s", "d", "w").collect()
      .map(r => r.getDouble(1)).toSet
    assert(got == Set(0.25))
  }

  // ------------------------------------------------------------ triangles

  test("triangleCount: hand graphs (triangle+tail, square, K4) and dup/direction tolerance") {
    def tri(edges: Seq[(Long, Long)]): (Long, Long, Long) = {
      val r = GraphOps.triangleCount(edges.toDF("a", "b"), "a", "b").collect()(0)
      (r.getLong(0), r.getLong(1), r.getLong(2))
    }
    // triangle 1-2-3 with tail 3-4; reversed + duplicate edges collapse
    assert(tri(Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L), (3L, 4L)))
      == ((4L, 4L, 1L)))
    // square: no triangle
    assert(tri(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L))) == ((4L, 4L, 0L)))
    // K4: 4 triangles
    assert(tri(Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L)))
      == ((4L, 6L, 4L)))
  }

  test("triangleCount agrees with brute force on a pseudo-random graph") {
    val edges = (for {
      a <- 1L to 30L; b <- (a + 1) to 30L
      if (a * 31 + b * 17) % 5 == 0
    } yield (a, b)).toSeq
    val es = edges.toSet
    val brute = (for {
      a <- 1L to 30L; b <- (a + 1) to 30L; c <- (b + 1) to 30L
      if es((a, b)) && es((b, c)) && es((a, c))
    } yield 1).size.toLong
    val got = GraphOps.triangleCount(edges.toDF("a", "b"), "a", "b")
      .collect()(0).getLong(2)
    assert(got == brute && brute > 0)
  }

  // ----------------------------------------------------------------- EWMA

  test("ewma: matches the driver-side recursion through the fixed-point lens") {
    val rows = Seq((1L, 10L, 1L, 3.0), (1L, 20L, 2L, 5.0), (1L, 30L, 3L, 2.0),
      (2L, 10L, 4L, 7.0))
    val got = EventOps.ewma(rows.toDF("k", "t", "id", "x"),
        Seq("k"), "t", "x", "id").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    // replicate: weights 2^-(n-i) (i==1) / 0.5*2^-(n-i) (i>1), floor(term*1e6)
    def fp(xs: Seq[Double]): Double = {
      val n = xs.size
      val s = xs.zipWithIndex.map { case (x, i0) =>
        val i = i0 + 1
        val w = math.pow(2.0, -(n - i).toDouble)
        val t = if (i == 1) x * w else x * 0.5 * w
        math.floor(t * 1e6).toLong
      }.sum
      s.toDouble / 1e6
    }
    assert(got(1L) == ((3L, fp(Seq(3.0, 5.0, 2.0)))))
    assert(got(2L) == ((1L, fp(Seq(7.0)))))
    // sanity: the k=1 recursion itself (y = a·x + (1-a)·y) to ~1e-6
    val y = Seq(5.0, 2.0).foldLeft(3.0)((acc, x) => 0.5 * x + 0.5 * acc)
    assert(math.abs(got(1L)._2 - y) < 2e-6)
  }

  test("ewma is invariant to input partitioning and rejects reserved names") {
    val df = (1L to 200L).map(i => (i % 7, i, i, (i * 13 % 101).toDouble / 7.0))
      .toDF("k", "t", "id", "x")
    val a = EventOps.ewma(df, Seq("k"), "t", "x", "id").collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val b = EventOps.ewma(df.repartition(7), Seq("k"), "t", "x", "id").collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(a == b)
    intercept[IllegalArgumentException] {
      EventOps.ewma(df.withColumn("__i", lit(1)), Seq("k"), "t", "x", "id") }
    intercept[IllegalArgumentException] {
      EventOps.ewma(df, Seq("k"), "t", "x", "id", kLog2 = 0) }
  }

  // --------------------------------------------------------- robust z/MAD

  test("robustOutliers: planted outlier surfaces, zero-MAD group emits nothing") {
    val base = (1L to 99L).map(i => (i, "a", 10.0 + (i % 3).toDouble)) // 10,11,12
    val out = Seq((100L, "a", 1000.0)) // way out
    val const = (1L to 50L).map(i => (200L + i, "c", 5.0)) // MAD = 0
    val df = (base ++ out ++ const).toDF("id", "g", "value")
    val got = Profiling.robustOutliers(df, Seq("g"), "value")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(got == Set(100L))
  }

  test("robustOutliers: z replicates the rounded med/MAD formula") {
    val df = ((1L to 20L).map(i => (i, (i % 5).toDouble)) :+ ((21L, 50.0)))
      .toDF("id", "value").withColumn("g", lit("x"))
    val r = Profiling.robustOutliers(df, Seq("g"), "value")
      .where(col("id") === 21).collect()(0)
    val vals = (1L to 20L).map(i => (i % 5).toDouble) :+ 50.0
    def pct(xs: Seq[Double], p: Double): Double = {
      val s = xs.sorted; val idx = p * (s.size - 1)
      val lo = s(idx.toInt); val hi = s(math.ceil(idx).toInt)
      lo + (idx - idx.toInt) * (hi - lo)
    }
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val med = r6(pct(vals, 0.5))
    val mad = r6(pct(vals.map(v => math.abs(v - med)), 0.5))
    val z = BigDecimal((50.0 - med) / (1.4826 * mad))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getDouble(r.fieldIndex("z")) == z)
  }

  // -------------------------------------------------- gopher + fertility

  test("gopherFlags: hand-computed metrics and rule outcomes") {
    val good = ("the a of and to in is that " + "alpha beta gamma delta " * 11)
      .trim // 52 words, all alphabetic, 8 stopword hits
    val bully = "- one\n- two\n- three\nplain line" // 3 of 4 lines bulleted
    val df = Seq((1L, good), (2L, bully), (3L, "")).toDF("doc_id", "text")
    val rows = TF.gopherFlags(df, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r).toMap
    val g = rows(1L)
    assert(g.getLong(g.fieldIndex("n_words")) == 52L)
    assert(g.getBoolean(g.fieldIndex("f_word_count")))
    assert(g.getBoolean(g.fieldIndex("f_alpha")))
    assert(g.getBoolean(g.fieldIndex("f_stop")))
    assert(g.getBoolean(g.fieldIndex("pass")))
    val b = rows(2L)
    assert(b.getDouble(b.fieldIndex("bullet_ratio")) == 0.75)
    assert(!b.getBoolean(b.fieldIndex("f_word_count"))) // 7 words < 50
    assert(!b.getBoolean(b.fieldIndex("pass")))
    val e = rows(3L)
    assert(e.getLong(e.fieldIndex("n_words")) == 0L)
    assert(!e.getBoolean(e.fieldIndex("pass")))
  }

  test("tokenizerFertility: exact totals and the rounded ratio") {
    val df = Seq(("en", "hello world"), ("en", "it's here"), ("zh", "你好吗"))
      .toDF("lang", "text")
    val got = TF.tokenizerFertility(df, "lang", "text").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))).toMap
    // en: words 2+2=4; bpe: hello,world=2; it,',s,here=4 -> 6; 6/4=1.5
    assert(got("en") == ((2L, 4L, 6L, 1.5)))
    // zh: 1 word, 3 CJK chars = 3 bpe tokens
    assert(got("zh") == ((1L, 1L, 3L, 3.0)))
  }

  // --------------------------------------------- labelPropagationStep

  test("labelPropagationStep: weight-majority wins, ties to smallest label, isolated keeps own") {
    // nodes 1,2,3 labeled A,B,B; edges 1-2 (w2), 1-3 (w1): node 1 sees
    // B with weight 3 -> flips; node 2 sees A(2), node 3 sees A(1) ->
    // both flip to A; node 4 isolated keeps C.
    val edges = Seq((1L, 2L, 2L), (1L, 3L, 1L)).toDF("src", "dst", "w")
    val labels = Seq((1L, "A"), (2L, "B"), (3L, "B"), (4L, "C"))
      .toDF("node_id", "lab")
    val got = graft.functions.GraphOps.labelPropagationStep(edges, labels,
        "src", "dst", "w", "node_id", "lab")
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getString(2))))
      .toMap
    assert(got == Map(1L -> (("B", "A")), 2L -> (("A", "B")),
      3L -> (("A", "B")), 4L -> (("C", "C"))))
    // tie: node 1 sees B(1) via 2 and A(1) via 3 -> smallest label A wins
    val tie = graft.functions.GraphOps.labelPropagationStep(
      Seq((1L, 2L, 1L), (1L, 3L, 1L)).toDF("src", "dst", "w"),
      Seq((1L, "C"), (2L, "B"), (3L, "A")).toDF("node_id", "lab"),
      "src", "dst", "w", "node_id", "lab")
      .where(col("node") === 1L).collect()(0)
    assert(tie.getString(1) == "A")
  }

  // ------------------------------------------- iterative convergence ops

  private def ringEdges(n: Long) =
    (1L to n).map(i => (i, if (i == n) 1L else i + 1, 1.0)).toDF("src", "dst", "w")

  test("pagerank loop == manually chained pagerankIter steps; first step == pagerankStep") {
    val edges = Seq((1L, 2L, 0.5), (1L, 3L, 0.5), (2L, 3L, 1.0), (3L, 1L, 1.0))
      .toDF("src", "dst", "w")
    // first step from uniform is exactly the from-uniform kernel
    assertSameRows(
      GraphOps.pagerank(edges, "src", "dst", "w", iterations = 1),
      GraphOps.pagerankStep(edges, "src", "dst", "w"))
    // the loop is step-for-step the manual chain (fixed-point determinism)
    val nodes = edges.select(col("src").as("node"))
      .unionAll(edges.select(col("dst").as("node"))).distinct()
    val n = nodes.agg(count(lit(1)).as("__n"))
    var manual = nodes.crossJoin(broadcast(n))
      .select(col("node"), (lit(1.0) / col("__n")).as("rank"))
    (1 to 3).foreach { _ =>
      manual = GraphOps.pagerankIter(edges, manual, "src", "dst", "w")
    }
    assertSameRows(
      GraphOps.pagerank(edges, "src", "dst", "w", iterations = 3), manual)
    // lineage truncation does not change values
    assertSameRows(
      GraphOps.pagerank(edges, "src", "dst", "w", iterations = 5, checkpointEvery = 1),
      GraphOps.pagerank(edges, "src", "dst", "w", iterations = 5, checkpointEvery = 100))
    intercept[IllegalArgumentException] {
      GraphOps.pagerank(edges, "src", "dst", "w", iterations = 0)
    }
  }

  test("pagerank tol: early stop lands within tol of a further step; uniform ring is instant") {
    // uniform ring: the uniform vector is the exact fixed point -> a
    // tol-stopped run equals the max-iteration run exactly
    val ring = ringEdges(6)
    assertSameRows(
      GraphOps.pagerank(ring, "src", "dst", "w", iterations = 50, tol = 1e-9),
      GraphOps.pagerank(ring, "src", "dst", "w", iterations = 1))
    // generic graph: after the tol-stop, ONE more step moves no rank by
    // more than tol (the convergence contract)
    val edges = Seq((1L, 2L, 0.7), (1L, 3L, 0.3), (2L, 3L, 1.0), (3L, 1L, 1.0),
      (3L, 4L, 0.0), (4L, 1L, 1.0)).toDF("src", "dst", "w")
    val tol = 1e-5
    val stopped = GraphOps.pagerank(edges, "src", "dst", "w",
      iterations = 200, tol = tol)
    val oneMore = GraphOps.pagerankIter(edges, stopped, "src", "dst", "w")
    val delta = oneMore.join(stopped.withColumnRenamed("rank", "prev"), "node")
      .agg(max(abs(col("rank") - col("prev")))).head().getDouble(0)
    assert(delta <= tol, s"post-stop delta $delta > tol $tol")
  }

  test("labelPropagate: equals manual steps, early-stops at a fixpoint idempotently") {
    // two cliques joined by one weak edge: LPA converges to per-clique
    // labels in a couple of rounds
    val edges = (Seq((1L, 2L), (1L, 3L), (2L, 3L), (4L, 5L), (4L, 6L), (5L, 6L))
      .map { case (a, b) => (a, b, 5L) } :+ ((3L, 4L, 1L)))
      .toDF("src", "dst", "w")
    val labels = (1L to 6L).map(i => (i, i)).toDF("id", "lab")
    def manual(k: Int) = {
      var cur = labels.select(col("id").as("node"), col("lab").as("label"))
      (1 to k).foreach { _ =>
        cur = GraphOps.labelPropagationStep(edges, cur, "src", "dst", "w",
          "node", "label").select(col("node"), col("label"))
      }
      cur
    }
    assertSameRows(
      GraphOps.labelPropagate(edges, labels, "src", "dst", "w", "id", "lab",
        maxIter = 3),
      manual(3))
    // converged: a larger maxIter returns the same frame (fixpoint
    // idempotence — extra rounds are the identity)
    assertSameRows(
      GraphOps.labelPropagate(edges, labels, "src", "dst", "w", "id", "lab",
        maxIter = 4),
      GraphOps.labelPropagate(edges, labels, "src", "dst", "w", "id", "lab",
        maxIter = 12))
    intercept[IllegalArgumentException] {
      GraphOps.labelPropagate(edges, labels, "src", "dst", "w", "id", "lab",
        maxIter = 0)
    }
  }

  test("graph loops: forced huge-graph regime (pre-shuffled SMJ) equals the broadcast regime") {
    // every fixture sits far under the 1M-node broadcast threshold, so
    // without forcing, the !small branch would ship untested: run both
    // regimes on a pseudo-random weighted graph and pin bit equality
    val rng = new scala.util.Random(17L)
    val raw = (1 to 300).map { _ =>
      (rng.nextInt(40).toLong, rng.nextInt(40).toLong, (rng.nextInt(5) + 1).toLong)
    }.filter { case (a, b, _) => a != b }
    val edges = raw.toDF("src", "dst", "w")
    // pagerank needs row-normalized out-weights for a sensible chain, but
    // regime equality only needs determinism — normalize anyway
    val tot = edges.groupBy("src").agg(sum("w").as("__t"))
    val norm = edges.join(tot, "src")
      .select(col("src"), col("dst"),
        round(col("w").cast("double") / col("__t"), 6).as("w"))
      .localCheckpoint(true)
    assertSameRows(
      GraphOps.pagerank(norm, "src", "dst", "w", iterations = 3),
      GraphOps.pagerank(norm, "src", "dst", "w", iterations = 3,
        broadcastNodesMax = 0L))
    val labels = raw.flatMap(e => Seq(e._1, e._2)).distinct
      .map(i => (i, i % 7)).toDF("id", "lab")
    assertSameRows(
      GraphOps.labelPropagate(edges, labels, "src", "dst", "w", "id", "lab",
        maxIter = 3),
      GraphOps.labelPropagate(edges, labels, "src", "dst", "w", "id", "lab",
        maxIter = 3, broadcastNodesMax = 0L))
  }

  test("triangleCountApprox: p=1 equals exact; concentration on a planted graph") {
    // planted graph: K12 (220 triangles) + a 40-node sparse ring (0)
    val k12 = for { a <- 1L to 12L; b <- (a + 1) to 12L } yield (a, b)
    val ring = (100L to 139L).map(i => (i, if (i == 139L) 100L else i + 1))
    val edges = (k12 ++ ring).toDF("a", "b")
    val exact = GraphOps.triangleCount(edges, "a", "b").collect()(0).getLong(2)
    assert(exact == 220L)
    val full = GraphOps.triangleCountApprox(edges, "a", "b", p = 1.0).collect()(0)
    assert(full.getLong(2) == exact && full.getDouble(3) == exact.toDouble)
    // p = 0.7 on the dense kernel: the deterministic-coin estimate must
    // land within the DOULION concentration band (generous 50% here —
    // the estimator is unbiased, variance ~ T/p^3; the hash coin makes
    // this a FIXED number, so the assertion is stable, not flaky)
    val est = GraphOps.triangleCountApprox(edges, "a", "b", p = 0.7)
      .collect()(0).getDouble(3)
    assert(math.abs(est - exact) / exact < 0.5, s"est $est vs exact $exact")
    intercept[IllegalArgumentException] {
      GraphOps.triangleCountApprox(edges, "a", "b", p = 0.0)
    }
  }
}
