package graft

import org.apache.spark.sql.functions._
import graft.operators.QuantileWindows._
import graft.intervals.IntervalCols

/** Mirrors reference `test/runtests.jl:21-30` (window generation) and the
  * span aggregate I6. */
class QuantileWindowsSpec extends SparkSuite {

  test("n windows: count, coverage, contiguity, near-equal widths (±1 ns)") {
    val df = fixture()
    val Some((lo, hi)) = IntervalCols.coveringSpan(df, "span")
    val w = quantileWindows(4, df, "span", "quarter")
    val rows = w.orderBy("quarter").select("quarter", "span.start", "span.stop").collect()
    assert(rows.length == 4)
    assert(rows.head.getLong(1) == lo)
    assert(rows.last.getLong(2) == hi)
    // contiguous
    rows.sliding(2).foreach { case Array(a, b) => assert(a.getLong(2) == b.getLong(1)) }
    // near-equal widths
    val widths = rows.map(r => r.getLong(2) - r.getLong(1))
    assert(widths.max - widths.min <= 1L)
    // labels 1..4
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L, 4L))
  }

  test("large n stays exact at epoch-ns magnitudes") {
    val lo = 1704067798778549829L
    val hi = 1706657176220708106L
    val w = quantileWindows(spark, 1000, lo, hi)
    val agg = w.agg(
      min(col("span.start")), max(col("span.stop")),
      max(col("span.stop") - col("span.start")) - min(col("span.stop") - col("span.start")),
      count(lit(1))).head()
    assert(agg.getLong(0) == lo)
    assert(agg.getLong(1) == hi)
    assert(agg.getLong(2) <= 1L)
    assert(agg.getLong(3) == 1000L)
  }

  test("empty frame yields empty window frame with correct schema (divergence from `missing`)") {
    val empty = fixture().limit(0)
    val w = quantileWindows(4, empty, "span", "index")
    assert(w.count() == 0)
    assert(w.columns.toSeq == Seq("index", "span"))
  }

  test("no shuffle in the plan (single narrow stage)") {
    val w = quantileWindows(spark, 1000000, 0L, 1L << 60)
    val plan = w.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
  }

  test("custom label values (reference's `label = sym => iterable`)") {
    val w = quantileWindowsLabeled(4, fixture(), "span",
      "quarter" -> Seq("Q1", "Q2", "Q3", "Q4"))
    assert(w.columns.toSeq == Seq("quarter", "span"))
    assert(w.orderBy("span.start").select("quarter").collect().map(_.getString(0)).toSeq ==
      Seq("Q1", "Q2", "Q3", "Q4"))
    // dead min_duration kwarg accepted and ignored, like the reference
    val w2 = quantileWindows(4, fixture(), "span", "index", minDuration = Some(123L))
    assert(w2.count() == 4)
    // arbitrary label value types (reference takes any iterable, e.g. an
    // integer range, src/DataFrameIntervals.jl:331-334)
    val wInt = quantileWindowsLabeled(4, fixture(), "span",
      "decade" -> Seq(1970, 1980, 1990, 2000))
    assert(wInt.schema("decade").dataType == org.apache.spark.sql.types.IntegerType)
    assert(wInt.orderBy("span.start").select("decade").collect().map(_.getInt(0)).toSeq ==
      Seq(1970, 1980, 1990, 2000))
    val wDouble = quantileWindowsLabeled(2, fixture(), "span",
      "weight" -> Seq(0.25, 0.75))
    assert(wDouble.orderBy("span.start").select("weight").collect().map(_.getDouble(0)).toSeq ==
      Seq(0.25, 0.75))
  }

  test("coveringSpan of empty frame is None") {
    assert(IntervalCols.coveringSpan(fixture().limit(0), "span").isEmpty)
  }
}
