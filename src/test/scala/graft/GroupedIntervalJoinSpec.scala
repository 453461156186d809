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
    val gNot = GroupedIntervalJoin.groupbyIntervalJoin(df2, quarters,
      Seq(Selector.Not(Selector.Name("x"))), "span" -> "span")
    assert(gNot.groupColumns.toSet == Set("label", "sublabel", "quarter"))
    val gBetween = GroupedIntervalJoin.groupbyIntervalJoin(df2, quarters,
      Seq(Selector.Between("label", "x")), "span" -> "span")
    assert(gBetween.groupColumns.toSet == Set("label", "x"))
    val gPred = GroupedIntervalJoin.groupbyIntervalJoin(df2, quarters,
      Seq(Selector.Predicate(_.startsWith("sub"))), "span" -> "span")
    assert(gPred.groupColumns == Seq("sublabel"))
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

  test("unknown columns error lists them Julia-style") {
    val e = intercept[IllegalArgumentException] {
      GroupedIntervalJoin.groupbyIntervalJoin(df, quarters,
        Seq(Selector.Name("nope"), Selector.Name("nada")), "span" -> "span")
    }
    assert(e.getMessage == "Columns do not exist: nope and nada")
  }
}
