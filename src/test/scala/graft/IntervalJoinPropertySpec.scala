package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.operators.IntervalJoin
import graft.operators.IntervalJoin.{Options, Strategy}

/** Property tests (SURVEY §5): over random interval sets, every physical
  * strategy must agree with an in-memory brute-force oracle — including
  * pathological shapes (nested intervals, heavy overlap, giant outliers).
  * Raw ScalaCheck generators driven by fixed seeds (the scalatest bridge
  * artifact isn't available offline). */
class IntervalJoinPropertySpec extends SparkSuite {

  private val genInterval: Gen[(Long, Long)] = for {
    start <- Gen.chooseNum(0L, 100000L)
    short <- Gen.oneOf(true, false)
    len <- if (short) Gen.chooseNum(1L, 100L) else Gen.chooseNum(1L, 50000L)
  } yield (start, start + len)

  private val genSet: Gen[List[(Long, Long)]] =
    Gen.chooseNum(0, 60).flatMap(n => Gen.listOfN(n, genInterval))

  private def sample(seed: Long): (List[(Long, Long)], List[(Long, Long)]) = {
    val g = for { a <- genSet; b <- genSet } yield (a, b)
    g.apply(Gen.Parameters.default, Seed(seed)).get
  }

  private def toDF(xs: List[(Long, Long)], tag: String) = {
    val schema = StructType(Seq(
      StructField(s"id_$tag", LongType, nullable = false),
      StructField("span", spanSchema, nullable = true)))
    val rows = xs.zipWithIndex.map { case ((s, e), i) => Row(i.toLong, Row(s, e)) }
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 3), schema)
  }

  private def brute(l: List[(Long, Long)], r: List[(Long, Long)]): Set[(Int, Int)] =
    (for {
      (a, i) <- l.zipWithIndex
      (b, j) <- r.zipWithIndex
      if a._1 < b._2 && b._1 < a._2
    } yield (i, j)).toSet

  test("range and binned strategies match the brute-force pair set on 20 random inputs") {
    (1 to 20).foreach { seed =>
      val (ls, rs) = sample(seed.toLong)
      val expected = brute(ls, rs)
      val lDF = toDF(ls, "l")
      val rDF = toDF(rs, "r")
      def pairs(strategy: Strategy, binWidth: Option[Long] = None) =
        IntervalJoin.intervalJoin(lDF, rDF, "span",
          Options(strategy = strategy, binWidth = binWidth))
          .select("id_l", "id_r").collect()
          .map(x => (x.getLong(0).toInt, x.getLong(1).toInt)).toSet
      assert(pairs(Strategy.Range) == expected, s"range strategy, seed=$seed")
      assert(pairs(Strategy.Binned) == expected, s"binned auto width, seed=$seed")
      assert(pairs(Strategy.Binned, binWidth = Some(7L)) == expected, s"binned w=7, seed=$seed")
      assert(pairs(Strategy.Sweep) == expected, s"sweep strategy, seed=$seed")
    }
  }

  private val genMaybeDegenerate: Gen[(Long, Long)] = Gen.frequency(
    8 -> genInterval,
    1 -> Gen.chooseNum(0L, 100000L).map(s => (s, s)),          // empty [s,s)
    1 -> genInterval.map { case (s, e) => (e, s) })            // reversed (corrupt)

  /** nasty shapes: exact duplicates, shared endpoints, all-spanning giants
    * (replicate to every sweep partition), dense point-ish intervals */
  private val genNasty: Gen[List[(Long, Long)]] = for {
    base <- Gen.chooseNum(0L, 1000L)
    nDup <- Gen.chooseNum(0, 15)
    nTie <- Gen.chooseNum(0, 15)
    nGiant <- Gen.chooseNum(0, 4)
    nTiny <- Gen.chooseNum(0, 20)
    tiny <- Gen.listOfN(nTiny, Gen.chooseNum(0L, 2000L).map(s => (s, s + 1)))
  } yield List.fill(nDup)((base, base + 100L)) ++
    (0 until nTie).map(i => (base, base + 10L + i)) ++
    List.fill(nGiant)((0L, 1000000L)) ++ tiny

  test("nasty shapes (dups, ties, all-spanning giants): all strategies agree with brute force") {
    (300 to 309).foreach { seed =>
      val g = for { a <- genNasty; b <- genNasty } yield (a, b)
      val (ls, rs) = g.apply(Gen.Parameters.default, Seed(seed.toLong)).get
      val expected = brute(ls, rs)
      val lDF = toDF(ls, "l")
      val rDF = toDF(rs, "r")
      for (strat <- Seq(Strategy.Range, Strategy.Binned, Strategy.Sweep)) {
        val got = IntervalJoin.intervalJoin(lDF, rDF, "span",
            Options(strategy = strat))
          .select("id_l", "id_r").collect()
          .map(x => (x.getLong(0).toInt, x.getLong(1).toInt))
        // with exact duplicate intervals the JOIN YIELDS duplicate pairs —
        // compare as multisets, not sets
        val gotM = got.groupBy(identity).view.mapValues(_.length).toMap
        val expM = (for {
          (a, i) <- ls.zipWithIndex; (b, j) <- rs.zipWithIndex
          if a._1 < b._2 && b._1 < a._2 && a._1 < a._2 && b._1 < b._2
        } yield (i, j)).groupBy(identity).view.mapValues(_.length).toMap
        assert(gotM == expM, s"seed=$seed strat=$strat")
      }
    }
  }

  /** fat tail: mostly short spans, a sub-1% sprinkle of corpus-length
    * giants — the shape where unsplit sweep replication degrades toward
    * all-partitions and the long/short split must route giants to the
    * broadcast branches without changing a single pair */
  private val genFatTail: Gen[List[(Long, Long)]] = for {
    nShort <- Gen.chooseNum(40, 120)
    short <- Gen.listOfN(nShort, for {
      s <- Gen.chooseNum(0L, 100000L); len <- Gen.chooseNum(1L, 40L)
    } yield (s, s + len))
    nGiant <- Gen.chooseNum(0, 2)
    giant <- Gen.listOfN(nGiant, for {
      s <- Gen.chooseNum(0L, 1000L); len <- Gen.chooseNum(90000L, 120000L)
    } yield (s, s + len))
    nDeg <- Gen.chooseNum(0, 3)
    deg <- Gen.listOfN(nDeg, Gen.chooseNum(0L, 100000L).map(s => (s, s)))
  } yield short ++ giant ++ deg

  test("sweep long/short split == unsplit on fat-tail mixes (forced, auto, and no-split thresholds)") {
    (400 to 411).foreach { seed =>
      val g = for { a <- genFatTail; b <- genFatTail } yield (a, b)
      val (ls, rs) = g.apply(Gen.Parameters.default, Seed(seed.toLong)).get
      val expected = brute(ls, rs)
        .filter { case (i, j) => ls(i)._1 < ls(i)._2 && rs(j)._1 < rs(j)._2 }
      val lDF = toDF(ls, "l")
      val rDF = toDF(rs, "r")
      def pairs(opts: Options) =
        IntervalJoin.intervalJoin(lDF, rDF, "span", opts)
          .select("id_l", "id_r").collect()
          .map(x => (x.getLong(0).toInt, x.getLong(1).toInt)).toSet
      // forced low threshold: every giant (and some shorts) goes broadcast
      assert(pairs(Options(strategy = Strategy.Sweep,
        sweepLongThreshold = Some(50L))) == expected, s"forced split, seed=$seed")
      // forced huge threshold: nothing splits — the unsplit baseline
      assert(pairs(Options(strategy = Strategy.Sweep,
        sweepLongThreshold = Some(Long.MaxValue))) == expected, s"no split, seed=$seed")
      // auto threshold (p99 of the sampled lengths)
      assert(pairs(Options(strategy = Strategy.Sweep)) == expected, s"auto, seed=$seed")
      // degenerate fallback knob: cap 0 forces the unsplit path even when
      // the threshold marks rows long
      assert(pairs(Options(strategy = Strategy.Sweep,
        sweepLongThreshold = Some(50L), sweepMaxBroadcastRows = 0L)) == expected,
        s"cap fallback, seed=$seed")
    }
  }

  test("outer joins: both strategies match the brute-force oracle incl. degenerate intervals") {
    (200 to 212).foreach { seed =>
      val g = for {
        a <- Gen.chooseNum(0, 40).flatMap(n => Gen.listOfN(n, genMaybeDegenerate))
        b <- Gen.chooseNum(0, 40).flatMap(n => Gen.listOfN(n, genMaybeDegenerate))
      } yield (a, b)
      val (ls, rs) = g.apply(Gen.Parameters.default, Seed(seed.toLong)).get
      // brute oracle: degenerate intervals (start >= stop) are empty sets —
      // they match nothing but survive outer joins as unmatched rows
      val matched = (for {
        (a, i) <- ls.zipWithIndex
        (b, j) <- rs.zipWithIndex
        if a._1 < b._2 && b._1 < a._2 && a._1 < a._2 && b._1 < b._2
      } yield (i.toLong, j.toLong)).toSet
      val lUnmatched = ls.indices.map(_.toLong).toSet -- matched.map(_._1)
      val rUnmatched = rs.indices.map(_.toLong).toSet -- matched.map(_._2)
      val lDF = toDF(ls, "l")
      val rDF = toDF(rs, "r")
      for {
        (kl, kr) <- Seq((true, false), (false, true), (true, true))
        strat <- Seq(Strategy.Range, Strategy.Binned)
      } {
        val expected = matched ++
          (if (kl) lUnmatched.map(_ -> -1L) else Set.empty) ++
          (if (kr) rUnmatched.map(-1L -> _) else Set.empty)
        val got = IntervalJoin.intervalJoin(lDF, rDF, "span",
            Options(strategy = strat, keepleft = kl, keepright = kr))
          .select("id_l", "id_r").collect()
          .map(x => (if (x.isNullAt(0)) -1L else x.getLong(0),
            if (x.isNullAt(1)) -1L else x.getLong(1))).toSet
        assert(got == expected, s"seed=$seed strat=$strat kl=$kl kr=$kr")
      }
    }
  }

  test("intersection is exactly [max(starts), min(stops)) for every matched pair") {
    (100 to 104).foreach { seed =>
      val (ls, rs) = sample(seed.toLong)
      val j = IntervalJoin.intervalJoin(toDF(ls, "l"), toDF(rs, "r"), "span",
        Options(strategy = Strategy.Binned))
      val bad = j.where(
        col("span.start") =!= greatest(col("span_left.start"), col("span_right.start")) ||
        col("span.stop") =!= least(col("span_left.stop"), col("span_right.stop")))
      assert(bad.count() == 0, s"seed=$seed")
    }
  }
}
