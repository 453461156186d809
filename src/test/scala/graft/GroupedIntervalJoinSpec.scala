package graft

import org.apache.spark.sql.functions._
import graft.operators.{GroupedIntervalJoin, IntervalJoin}
import graft.operators.GroupedIntervalJoin.Selector
import graft.operators.QuantileWindows._

/** Mirrors reference `test/runtests.jl:82-121`: the key self-equivalence
  * `combine(groupby_interval_join(...), f) == combine(groupby(interval_join(...)), f)`
  * across selector types, plus the pinned error messages. */
class GroupedIntervalJoinSpec extends SparkSuite {

  lazy val df = fixture()
  lazy val df2 = { // F3: second grouping column
    val rng = new scala.util.Random(7L)
    val sub = udf(() => "klmn"(rng.nextInt(4)).toString) // test-only fixture udf
    df.withColumn("sublabel", element_at(
      array(lit("k"), lit("l"), lit("m"), lit("n")),
      (pmod(hash(col("x")), lit(4)) + 1).cast("int")))
  }
  lazy val quarters = quantileWindows(4, df, "span", "quarter")

  def direct(groups: Seq[String]) =
    IntervalJoin.intervalJoin(df, quarters, "span")
      .groupBy(groups.map(col): _*)
      .agg(mean("x").as("mean_x"), count(lit(1)).as("n"))

  test("agg equivalence with plain names (both sides)") {
    val g = GroupedIntervalJoin.groupbyIntervalJoin(df, quarters,
      Seq(Selector.Name("label"), Selector.Name("quarter")), "span" -> "span")
    assertSameRows(
      g.agg(mean("x").as("mean_x"), count(lit(1)).as("n")),
      direct(Seq("label", "quarter")))
  }

  test("regex selector") {
    val g = GroupedIntervalJoin.groupbyIntervalJoin(df, quarters,
      Seq(Selector.Pattern("^quart")), "span" -> "span")
    assert(g.groupColumns == Seq("quarter"))
    assertSameRows(
      g.agg(mean("x").as("mean_x"), count(lit(1)).as("n")),
      direct(Seq("quarter")))
  }

  test("Not / Between / Predicate selectors") {
    // reference Not (test/runtests.jl:101): the skip set must cover the on
    // column — only the PRESENT skip names are skipped per side
    val gNot = GroupedIntervalJoin.groupbyIntervalJoin(df2, quarters,
      Seq(Selector.Not(Selector.Names(Seq("x", "span")))), "span" -> "span")
    assert(gNot.groupColumns.toSet == Set("label", "sublabel", "quarter"))
    val gBetween = GroupedIntervalJoin.groupbyIntervalJoin(df2, quarters,
      Seq(Selector.Between("label", "x")), "span" -> "span")
    assert(gBetween.groupColumns.toSet == Set("label", "x"))
    val gPred = GroupedIntervalJoin.groupbyIntervalJoin(df2, quarters,
      Seq(Selector.Predicate(_.startsWith("sub"))), "span" -> "span")
    assert(gPred.groupColumns == Seq("sublabel"))
  }

  test("non-Name selectors touching the on column error like the reference") {
    // check_oncol applies to the RESOLVED set of every selector form
    // (src/DataFrameIntervals.jl:190-193, 220-236)
    def expectOncol(sel: Selector): Unit = {
      val e = intercept[IllegalArgumentException] {
        GroupedIntervalJoin.groupbyIntervalJoin(df2, quarters, Seq(sel), "span" -> "span")
      }
      assert(e.getMessage ==
        "Column span cannot be used for grouping during a call to `split_into_combine`.",
        e.getMessage)
    }
    expectOncol(Selector.Pattern("span|label"))
    expectOncol(Selector.Predicate(_ == "span"))
    // a Not whose skip set does not cover the on column resolves to a
    // complement containing it (the reference errors here too)
    expectOncol(Selector.Not(Selector.Name("x")))
    // a Between range positionally covering the on column (label,x,SPAN,sublabel)
    expectOncol(Selector.Between("x", "sublabel"))
    // a Between endpoint that IS the on column errors at endpoint resolution
    expectOncol(Selector.Between("span", "sublabel"))
  }

  test("Between endpoints missing on both sides propagate to Columns-do-not-exist") {
    // ref :229-236: invalid endpoints surface as Invalid markers, erroring
    // only when no side resolves them (:272-275)
    val e = intercept[IllegalArgumentException] {
      GroupedIntervalJoin.groupbyIntervalJoin(df2, quarters,
        Seq(Selector.Between("nope", "nada")), "span" -> "span")
    }
    assert(e.getMessage == "Columns do not exist: nope and nada")
    // an endpoint pair valid on ONE side resolves there without error
    val ok = GroupedIntervalJoin.groupbyIntervalJoin(df2, quarters,
      Seq(Selector.Between("label", "x")), "span" -> "span")
    assert(ok.groupColumns.toSet == Set("label", "x"))
  }

  test("All selector rejected with the reference's stale message") {
    val e = intercept[IllegalArgumentException] {
      GroupedIntervalJoin.groupbyIntervalJoin(df, quarters, Seq(Selector.All), "span" -> "span")
    }
    assert(e.getMessage.contains("cannot be used for grouping during a call to `split_into_combine`"))
  }

  test("grouping by the on column rejected") {
    val e = intercept[IllegalArgumentException] {
      GroupedIntervalJoin.groupbyIntervalJoin(df, quarters,
        Seq(Selector.Name("span")), "span" -> "span")
    }
    assert(e.getMessage.contains("span cannot be used for grouping"))
  }

  test("per-group iteration: keys ordered, groups partition the join, aggs agree") {
    // the reference's `for gdf in groupby_interval_join(...)` surface
    // (src/DataFrameIntervals.jl:293-310): iteration over per-group frames
    // is semantically groupby(interval_join(...)) group by group
    val g = GroupedIntervalJoin.groupbyIntervalJoin(df, quarters,
      Seq(Selector.Name("quarter")), "span" -> "span")
    val ks = g.keys
    assert(ks.map(_.getLong(0)).toSeq == ks.map(_.getLong(0)).toSeq.sorted)
    val perGroup = g.iterator.map { case (k, gdf) =>
      val r = gdf.agg(mean("x").as("mean_x"), count(lit(1)).as("n")).head()
      (k.getLong(0), r.getDouble(0), r.getLong(1))
    }.toSeq
    val combined = direct(Seq("quarter")).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSeq
    assert(perGroup.toSet == combined.toSet)
    // the groups partition the joined frame: sizes sum to the join size
    assert(perGroup.map(_._3).sum == g.joined.count())
  }

  test("keys/iterator maxGroups guard: clear error above the bound, fine at it") {
    val g = GroupedIntervalJoin.groupbyIntervalJoin(df, quarters,
      Seq(Selector.Name("quarter")), "span" -> "span")
    val nGroups = g.keys.length // 4 quarters
    // at the bound: succeeds
    assert(g.boundedKeys(nGroups).length == nGroups)
    assert(g.boundedIterator(nGroups).size == nGroups)
    // below the bound: a clear require error, NOT a driver OOM
    val e = intercept[IllegalArgumentException] { g.boundedKeys(nGroups - 1) }
    assert(e.getMessage.contains("more than"))
    assert(e.getMessage.contains("agg"))
    intercept[IllegalArgumentException] { g.boundedIterator(nGroups - 1).toSeq }
    intercept[IllegalArgumentException] { g.boundedKeys(0) }
  }

  test("unknown columns error lists them Julia-style") {
    val e = intercept[IllegalArgumentException] {
      GroupedIntervalJoin.groupbyIntervalJoin(df, quarters,
        Seq(Selector.Name("nope"), Selector.Name("nada")), "span" -> "span")
    }
    assert(e.getMessage == "Columns do not exist: nope and nada")
  }
}
