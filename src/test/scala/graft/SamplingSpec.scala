package graft

import org.apache.spark.sql.functions._
import graft.functions.{Sampling, TextFunctions => TF}

class SamplingSpec extends SparkSuite {
  import spark.implicits._

  lazy val keys = (0L until 2000L).toDF("id")

  test("splitByHash: total assignment, determinism, and sane proportions") {
    val s = Sampling.splitByHash(keys, "id", Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    assert(s.count() == 2000)
    val counts = s.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.keySet == Set("train", "val", "test"))
    assert(counts("train") > 1500 && counts("train") < 1700, counts.toString)
    assert(counts("val") > 140 && counts("val") < 260, counts.toString)
    // deterministic: the same call yields the same assignment
    val s2 = Sampling.splitByHash(keys, "id", Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    assert(s.except(s2).count() == 0 && s2.except(s).count() == 0)
    // bad fractions rejected
    intercept[IllegalArgumentException] {
      Sampling.splitByHash(keys, "id", Seq("a" -> 0.5, "b" -> 0.2))
    }
  }

  test("same key always lands in the same split regardless of other columns (leakage guard)") {
    val chunks = keys.withColumn("chunk", explode(array(lit(1), lit(2), lit(3))))
    val s = Sampling.splitByHash(chunks, "id", Seq("train" -> 0.9, "test" -> 0.1))
    val perKey = s.groupBy("id").agg(countDistinct("split").as("n"))
    assert(perKey.where(col("n") =!= 1).count() == 0)
  }

  test("sampleByHash: deterministic subset at roughly the requested fraction") {
    val a = Sampling.sampleByHash(keys, "id", 0.2)
    val b = Sampling.sampleByHash(keys, "id", 0.2)
    assert(a.except(b).count() == 0 && b.except(a).count() == 0)
    val n = a.count()
    assert(n > 300 && n < 500, s"n=$n")
    // a smaller fraction with the same salt is a SUBSET (nested samples)
    val small = Sampling.sampleByHash(keys, "id", 0.05)
    assert(small.except(a).count() == 0)
  }

  test("stratifiedSampleByHash: per-stratum fractions") {
    val df = keys.withColumn("lang", when(col("id") % 2 === 0, "en").otherwise("de"))
    val s = Sampling.stratifiedSampleByHash(df, "id", "lang",
      Map("en" -> 0.5, "de" -> 0.1))
    val counts = s.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts("en") > 380 && counts("en") < 620, counts.toString)
    assert(counts("de") > 50 && counts("de") < 150, counts.toString)
    // default fraction 0: unknown strata dropped entirely
    val s2 = Sampling.stratifiedSampleByHash(df, "id", "lang", Map("en" -> 0.5))
    assert(s2.where(col("lang") === "de").count() == 0)
  }

  test("resampleByWeight: integer weights repeat exactly; fractional weights are hash-Bernoulli") {
    val df = keys.withColumn("lang",
      when(col("id") % 3 === 0, "en").when(col("id") % 3 === 1, "de").otherwise("zh"))
    val r = Sampling.resampleByWeight(df, "id", "lang",
      Map("en" -> 3.0, "de" -> 1.5, "zh" -> 0.25))
    val counts = r.groupBy("lang").count().collect()
      .map(x => x.getString(0) -> x.getLong(1)).toMap
    // en: every row exactly 3 copies (667 keys -> 2001 rows, epochs 0,1,2)
    assert(counts("en") == 3 * df.where(col("lang") === "en").count())
    val enEpochs = r.where(col("lang") === "en").groupBy("id")
      .agg(collect_set("epoch").as("es"))
    assert(enEpochs.where(size(col("es")) =!= 3).count() == 0)
    // de: 1.5x -> every key at least once, ~half twice
    val deKeys = df.where(col("lang") === "de").count()
    assert(counts("de") > (deKeys * 1.3).toLong && counts("de") < (deKeys * 1.7).toLong,
      counts.toString)
    assert(r.where(col("lang") === "de").select("id").distinct().count() == deKeys)
    // zh: ~quarter of keys kept, epoch always 0
    assert(counts("zh") > (667 * 0.15).toLong && counts("zh") < (667 * 0.35).toLong,
      counts.toString)
    assert(r.where(col("lang") === "zh" && col("epoch") =!= 0).count() == 0)
    // deterministic + append-stable: re-running yields the identical multiset
    val r2 = Sampling.resampleByWeight(df, "id", "lang",
      Map("en" -> 3.0, "de" -> 1.5, "zh" -> 0.25))
    assert(r.except(r2).count() == 0 && r2.except(r).count() == 0)
    // unknown strata keep defaultWeight = 1.0 (pass-through, epoch 0)
    val r3 = Sampling.resampleByWeight(df, "id", "lang", Map("en" -> 2.0))
    assert(r3.where(col("lang") =!= "en").count() == df.where(col("lang") =!= "en").count())
    // negative weights and epoch clashes rejected
    intercept[IllegalArgumentException] {
      Sampling.resampleByWeight(df, "id", "lang", Map("en" -> -1.0))
    }
    intercept[IllegalArgumentException] {
      Sampling.resampleByWeight(df.withColumn("epoch", lit(0)), "id", "lang", Map())
    }
  }

  test("globalShuffle: contiguous permutation equal to the single-window rank, any bucketing") {
    import org.apache.spark.sql.expressions.Window
    val df = keys.repartition(7) // deliberately awkward input layout
    val s = Sampling.globalShuffle(df, "id")
    val rows = s.collect().map(r => r.getLong(0) -> r.getLong(1))
    // exactly 0..n-1, each once
    assert(rows.map(_._2).sorted.toSeq == (0L until 2000L))
    // equals the one-task window reference (small data makes it feasible)
    val hkey = TF.tokenHashMod(concat(lit("shuffle:"), col("id").cast("string")))
    val ref = keys.withColumn("h", hkey)
      .withColumn("idx", row_number().over(Window.orderBy(col("h"), col("id"))).cast("long") - 1L)
      .select("id", "idx").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows.toMap == ref)
    // deterministic across runs and input partitioning
    val s2 = Sampling.globalShuffle(keys.repartition(3), "id")
    assert(s2.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap == ref)
    // a different salt is a different permutation of the same id set
    val s3 = Sampling.globalShuffle(df, "id", salt = "epoch1")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(s3 != ref && s3.values.toSeq.sorted == (0L until 2000L))
    // reserved/clashing columns rejected
    intercept[IllegalArgumentException] {
      Sampling.globalShuffle(df.withColumn("idx", lit(1)), "id")
    }
    intercept[IllegalArgumentException] {
      Sampling.globalShuffle(df.withColumn("__bucket", lit(1)), "id")
    }
  }

  test("capByBudget: kept set == windowed running-sum reference, global and per-stratum") {
    import org.apache.spark.sql.expressions.Window
    val rnd = new scala.util.Random(11)
    val df = (0L until 1500L).map(i =>
      (i, if (i % 3 == 0) "en" else if (i % 3 == 1) "fr" else "zh",
        rnd.nextInt(50).toLong)).toDF("id", "lang", "v").repartition(7)
    def ref(w: org.apache.spark.sql.expressions.WindowSpec, budget: Long) = {
      val hkey = TF.tokenHashMod(concat(lit("budget:"), col("id").cast("string")))
      df.withColumn("h", hkey)
        .withColumn("cum", sum(col("v")).over(w.orderBy(col("h"), col("id"))))
        .where(col("cum") <= budget).select("id").as[Long].collect().toSet
    }
    // global budget
    val g = Sampling.capByBudget(df, "id", "v", 5000L)
    assert(g.columns.toSeq == Seq("id", "lang", "v")) // schema passes through
    assert(g.select("id").as[Long].collect().toSet == ref(Window.partitionBy(), 5000L))
    // per-stratum budget over the same order
    val s = Sampling.capByBudget(df, "id", "v", 3000L, strataCols = Seq("lang"))
    assert(s.select("id").as[Long].collect().toSet ==
      ref(Window.partitionBy(col("lang")), 3000L))
    // every stratum's kept token total fits the budget
    val totals = s.groupBy("lang").agg(sum("v")).collect().map(_.getLong(1))
    assert(totals.nonEmpty && totals.forall(_ <= 3000L))
    // determinism across input partitioning
    val s2 = Sampling.capByBudget(df.repartition(3), "id", "v", 3000L, Seq("lang"))
    assert(s2.select("id").as[Long].collect().toSet ==
      s.select("id").as[Long].collect().toSet)
    // a zero budget keeps nothing; negative budget rejected
    assert(Sampling.capByBudget(df, "id", "v", 0L).count() == 0L)
    intercept[IllegalArgumentException] {
      Sampling.capByBudget(df, "id", "v", -1L)
    }
    // negative / null values raise instead of corrupting the running sum
    intercept[Exception] {
      Sampling.capByBudget(df.withColumn("v", col("v") - 100L), "id", "v", 5000L).count()
    }
    intercept[Exception] {
      Sampling.capByBudget(
        df.withColumn("v", when(col("id") === 7L, lit(null)).otherwise(col("v"))),
        "id", "v", 5000L).count()
    }
    // per-stratum budget MAP: each stratum keeps its own windowed prefix;
    // a stratum absent from the map gets the default (here 0 -> dropped)
    val m = Sampling.capByBudgetPerStratum(df, "id", "v", "lang",
      Map("en" -> 4000L, "fr" -> 1000L))
    val mt = m.groupBy("lang").agg(sum("v")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(!mt.contains("zh") && mt("en") <= 4000L && mt("fr") <= 1000L)
    assert(m.where(col("lang") === "en").select("id").as[Long].collect().toSet ==
      ref(Window.partitionBy(col("lang")), 4000L)
        .intersect(df.where(col("lang") === "en").select("id").as[Long].collect().toSet))
    assert(m.where(col("lang") === "fr").select("id").as[Long].collect().toSet ==
      ref(Window.partitionBy(col("lang")), 1000L)
        .intersect(df.where(col("lang") === "fr").select("id").as[Long].collect().toSet))
  }

  test("takeNPerStratum: exact quota, window-rank reference, append stability") {
    val docs = (0L until 300L).map(i => (i, s"lang${i % 3}")).toDF("id", "lang")
    val got = Sampling.takeNPerStratum(docs, "id", "lang", 10)
    val rows = got.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    // exactly 10 per stratum, ranks dense 1..10
    rows.groupBy(_._2).foreach { case (_, g) =>
      assert(g.length == 10)
      assert(g.map(_._3).sorted.toSeq == (1L to 10L).toSeq)
    }
    // matches the single-window row_number reference
    val ref = docs
      .withColumn("hv", TF.tokenHashMod(concat(lit("taken:"), col("id").cast("string"))))
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("lang")
          .orderBy(col("hv"), col("id"))).cast("long"))
      .where(col("rank") <= 10).select("id", "lang", "rank")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(rows.toSet == ref)
    // n >= stratum size keeps the whole stratum
    assert(Sampling.takeNPerStratum(docs, "id", "lang", 1000).count() == 300)
    // append stability: new keys can only push an existing key's rank UP
    // (insert earlier in hash order), never down — and the surviving old
    // keys keep their relative hash order
    val more = (300L until 400L).map(i => (i, s"lang${i % 3}")).toDF("id", "lang")
    val after = Sampling.takeNPerStratum(docs.union(more), "id", "lang", 10)
      .collect().map(r => ((r.getLong(0), r.getString(1)), r.getLong(2))).toMap
    rows.foreach { case (id, l, rk) =>
      after.get((id, l)).foreach(rk2 => assert(rk2 >= rk))
    }
    rows.groupBy(_._2).foreach { case (l, g) =>
      val stillIn = g.filter(x => after.contains((x._1, l))).sortBy(_._3)
      val ranksAfter = stillIn.map(x => after((x._1, l))).toSeq
      assert(ranksAfter == ranksAfter.sorted &&
        ranksAfter.distinct.length == ranksAfter.length)
    }
    // partitioning invariance
    val rep = Sampling.takeNPerStratum(docs.repartition(17), "id", "lang", 10)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(rep == rows.toSet)
    // reserved output name: a pre-existing `rank` column is rejected, not
    // silently overwritten
    val clash = intercept[IllegalArgumentException] {
      Sampling.takeNPerStratum(docs.withColumn("rank", lit(0)), "id", "lang", 10)
    }
    assert(clash.getMessage.contains("rank"))
  }

  test("weightedTakeN: quota, window-race reference, weight-proportional wins, guards") {
    import spark.implicits._
    val docs = (0L until 200L).map(i => (i, s"lang${i % 2}", 1.0 + (i % 5)))
      .toDF("id", "lang", "w")
    val got = Sampling.weightedTakeN(docs, "id", "w", "lang", 10)
    val rows = got.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(3)))
    rows.groupBy(_._2).foreach { case (_, g) =>
      assert(g.length == 10)
      assert(g.map(_._3).sorted.toSeq == (1L to 10L).toSeq)
    }
    // matches the single-window exponential-race reference
    val u = (TF.tokenHashMod(concat(lit("wtake:"), col("id").cast("string"))) + 1L)
      .cast("double") / lit((TF.HashMod + 1L).toDouble)
    val race = round(-log(u) / col("w"), 6)
    val ref = docs.withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("lang")
          .orderBy(race, col("id"))).cast("long"))
      .where(col("rank") <= 10)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(3))).toSet
    assert(rows.toSet == ref)
    // heavier rows win more often: weight-9 vs weight-1 head-to-head across
    // 40 salts — expect ~36 heavy wins; 28 is >4 sigma below that
    val duel = Seq((1L, "g", 9.0), (2L, "g", 1.0)).toDF("id", "g", "w")
    val heavyWins = (0 until 40).count { s =>
      Sampling.weightedTakeN(duel, "id", "w", "g", 1, salt = s"duel$s")
        .head.getLong(0) == 1L
    }
    assert(heavyWins >= 28, s"heavy won only $heavyWins/40")
    // partitioning invariance
    val rep = Sampling.weightedTakeN(docs.repartition(17), "id", "w", "lang", 10)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(3))).toSet
    assert(rep == rows.toSet)
    // guards: reserved rank column; non-positive / null weights raise
    intercept[IllegalArgumentException] {
      Sampling.weightedTakeN(docs.withColumn("rank", lit(0)), "id", "w", "lang", 1)
    }
    intercept[Exception] {
      Sampling.weightedTakeN(docs.withColumn("w", col("w") - 10.0),
        "id", "w", "lang", 1).count()
    }
    intercept[Exception] {
      Sampling.weightedTakeN(
        docs.withColumn("w", when(col("id") === 7L, lit(null)).otherwise(col("w"))),
        "id", "w", "lang", 1).count()
    }
  }

  test("repetition ratios: exact values on known inputs") {
    val d = Seq(
      (1L, "a a b"),          // 3 tokens, 2 distinct
      (2L, "a b a b"),        // bigrams: [a b, b a, a b] -> 2/3 distinct
      (3L, "x y z"),          // no repetition
      (4L, "")                // empty
    ).toDF("id", "text")
    val r = d.select(col("id"), TF.dupTokenRatio(col("text")).as("t"),
        TF.dupBigramRatio(col("text")).as("b"))
      .collect().map(x => x.getLong(0) -> ((x.getDouble(1), x.getDouble(2)))).toMap
    assert(r(1L) == ((0.333333, 0.0)))
    assert(r(2L) == ((0.5, 0.333333)))
    assert(r(3L) == ((0.0, 0.0)))
    assert(r(4L) == ((0.0, 0.0)))
  }

  lazy val mixFixture = (0L until 1000L).toDF("id")
    .withColumn("lang",
      when(col("id") < 640, "en").when(col("id") < 840, "de")
        .when(col("id") < 960, "fr").otherwise("zh"))

  test("temperatureWeights: alpha=1 is the natural mix (all weights 1)") {
    val w = Sampling.temperatureWeights(mixFixture, "lang", 1.0).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3))))
      .toMap
    assert(w("en") == ((640L, 0.64, 1.0)))
    assert(w("zh") == ((40L, 0.04, 1.0)))
  }

  test("temperatureWeights: alpha=0 targets the uniform mix") {
    val w = Sampling.temperatureWeights(mixFixture, "lang", 0.0).collect()
      .map(r => r.getString(0) -> ((r.getDouble(2), r.getDouble(3)))).toMap
    assert(w.values.forall(_._1 == 0.25))
    // weight = (N/k)/c: en 250/640, zh 250/40
    assert(w("en")._2 == 0.390625 && w("zh")._2 == 6.25)
  }

  test("temperatureWeights: alpha=0.5 matches the closed form") {
    val w = Sampling.temperatureWeights(mixFixture, "lang", 0.5).collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    val cs = Map("en" -> 640.0, "de" -> 200.0, "fr" -> 120.0, "zh" -> 40.0)
    // fold in sorted-lang order, like the operator
    val den = cs.toSeq.sortBy(_._1).map { case (_, c) => math.sqrt(c) }
      .foldLeft(0.0)(_ + _)
    cs.foreach { case (l, c) =>
      val exp = BigDecimal(math.sqrt(c) / den)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(w(l) == exp, s"$l: ${w(l)} vs $exp")
    }
  }

  test("resampleToTemperature: realized mix moves toward the target") {
    val out = Sampling.resampleToTemperature(mixFixture, "id", "lang", 0.5)
    val counts = out.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = counts.values.sum.toDouble
    // sqrt-scaled targets: en .446 de .249 fr .193 zh .111 (from natural
    // shares .64/.20/.12/.04) — zh must rise, en must fall
    assert(counts("zh") / total > 0.08, counts.toString)
    assert(counts("en") / total < 0.56, counts.toString)
    // deterministic
    val again = Sampling.resampleToTemperature(mixFixture, "id", "lang", 0.5)
    assertSameRows(out, again)
  }
}
