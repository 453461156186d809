package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.intervals.IntervalCols
import graft.operators.{IntervalJoin, QuantileWindows}
import graft.operators.IntervalJoin.{Options, Strategy}

/** Timestamp-struct intervals flow through every operator natively and come
  * back in the input representation (`backto`, reference
  * `src/DataFrameIntervals.jl:32-35,44-46`): internally exact long-µs ticks,
  * no lossy arithmetic. */
class TimestampIntervalSpec extends SparkSuite {
  import spark.implicits._

  /** the long fixture converted to µs-timestamp structs */
  lazy val nsDf = fixture()
  lazy val tsDf = nsDf.select(col("label"), col("x"),
    struct(
      timestamp_micros(expr("span.start div 1000")).as("start"),
      timestamp_micros(expr("span.stop div 1000")).as("stop")).as("span"))
  /** ns fixture truncated to µs so the ts and long paths see identical ticks */
  lazy val usDf = nsDf.select(col("label"), col("x"),
    struct(expr("(span.start div 1000) * 1000").as("start"),
      expr("(span.stop div 1000) * 1000").as("stop")).as("span"))

  test("quantileWindows on a timestamp span column returns timestamp windows") {
    val w = QuantileWindows.quantileWindows(8, tsDf, "span", "idx")
    val t = w.schema("span").dataType.asInstanceOf[StructType]
    assert(t("start").dataType == TimestampType && t("stop").dataType == TimestampType)
    assert(w.count() == 8)
    // contiguous + covering: stop(i) == start(i+1), first == lo, last == hi
    val rows = w.orderBy("idx")
      .select(unix_micros(col("span.start")), unix_micros(col("span.stop")))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    rows.sliding(2).foreach { case Array(a, b) => assert(a._2 == b._1); case _ => () }
    val us = tsDf.select(unix_micros(col("span.start")).as("s"), unix_micros(col("span.stop")).as("e"))
      .agg(min("s"), max("e")).head()
    assert(rows.head._1 == us.getLong(0) && rows.last._2 == us.getLong(1))
  }

  test("interval join on timestamp intervals == join on equivalent long intervals") {
    for (strat <- Seq(Strategy.Range, Strategy.Binned)) {
      val wTs = QuantileWindows.quantileWindows(4, tsDf, "span", "q")
      val wUs = QuantileWindows.quantileWindows(4,
        usDf.select(col("label"), col("x"),
          struct(expr("span.start div 1000").as("start"), expr("span.stop div 1000").as("stop")).as("span")),
        "span", "q")
      val jTs = IntervalJoin.intervalJoin(tsDf, wTs, "span", Options(strategy = strat))
        .select(col("label"), col("x"), col("q"),
          unix_micros(col("span.start")).as("is"), unix_micros(col("span.stop")).as("ie"))
      val jUs = IntervalJoin.intervalJoin(
        usDf.select(col("label"), col("x"),
          struct(expr("span.start div 1000").as("start"), expr("span.stop div 1000").as("stop")).as("span")),
        wUs, "span", Options(strategy = strat))
        .select(col("label"), col("x"), col("q"),
          col("span.start").as("is"), col("span.stop").as("ie"))
      assertSameRows(jTs, jUs)
      // output columns carry the timestamp representation (backto)
      val j = IntervalJoin.intervalJoin(tsDf, wTs, "span", Options(strategy = strat))
      for (c <- Seq("span_left", "span_right", "span")) {
        val t = j.schema(c).dataType.asInstanceOf[StructType]
        assert(t("start").dataType == TimestampType, s"$c/$strat")
      }
    }
  }

  test("outer join on timestamps: unmatched rows keep NULL intersection (not struct(NULL,NULL))") {
    val lo = tsDf.select(min(col("span.start"))).head().getTimestamp(0)
    val wins = QuantileWindows.quantileWindows(2, tsDf, "span", "h")
      .limit(1) // only the first half -> some spans unmatched
    val j = IntervalJoin.intervalJoin(tsDf, wins, "span", Options(keepleft = true))
    val unmatched = j.where(col("h").isNull)
    assert(unmatched.count() > 0)
    assert(unmatched.where(col("span").isNotNull).count() == 0)
  }

  test("mixed timestamp/long representations are rejected with a clear error") {
    val e = intercept[IllegalArgumentException] {
      IntervalJoin.intervalJoin(tsDf, nsDf.select(col("span")), "span")
    }
    assert(e.getMessage.contains("same representation"))
  }
}
