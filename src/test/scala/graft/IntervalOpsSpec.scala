package graft

import org.apache.spark.sql.functions._
import graft.operators.IntervalOps

class IntervalOpsSpec extends SparkSuite {
  import spark.implicits._

  def spans(xs: (String, Long, Long)*) = xs.toSeq.toDF("k", "s", "e")
    .select(col("k"), struct(col("s").as("start"), col("e").as("stop")).as("span"))

  test("mergeIntervals coalesces overlapping and touching, keeps gaps apart") {
    val d = spans(("a", 0L, 10L), ("a", 5L, 20L), ("a", 20L, 30L), // one merged run [0,30)
      ("a", 40L, 50L),                                             // gap -> separate
      ("b", 0L, 5L))
    val m = IntervalOps.mergeIntervals(d, Seq("k"), "span")
      .select(col("k"), col("span.start"), col("span.stop"), col("n_merged"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(m == Set(("a", 0L, 30L, 3L), ("a", 40L, 50L, 1L), ("b", 0L, 5L, 1L)))
  }

  test("nested intervals merge into their container") {
    val d = spans(("a", 0L, 100L), ("a", 10L, 20L), ("a", 30L, 40L))
    val m = IntervalOps.mergeIntervals(d, Seq("k"), "span").collect()
    assert(m.length == 1 && m.head.getLong(2) == 3L)
  }

  test("coveredDuration counts overlap once") {
    val d = spans(("a", 0L, 10L), ("a", 5L, 15L), ("a", 20L, 25L))
    val c = IntervalOps.coveredDuration(d, Seq("k"), "span").head
    assert(c.getLong(1) == 20L) // [0,15) + [20,25)
  }

  test("sessionize splits on gap, pads stop, counts events") {
    val ev = Seq(("u1", 0L), ("u1", 10L), ("u1", 100L), ("u2", 5L))
      .toDF("user", "ts")
    val s = IntervalOps.sessionize(ev, Seq("user"), "ts", gapNs = 50L, padNs = 1L)
      .select(col("user"), col("session"), col("span.start"), col("span.stop"), col("n_events"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSet
    assert(s == Set(("u1", 1L, 0L, 11L, 2L), ("u1", 2L, 100L, 101L, 1L), ("u2", 1L, 5L, 6L, 1L)))
  }

  test("single shuffle: plan has one Exchange for window + reuses it for the aggregate") {
    val d = spans(("a", 0L, 10L))
    val plan = IntervalOps.mergeIntervals(d, Seq("k"), "span").queryExecution.executedPlan.toString
    // partitioned by k for the window; groupBy (k, __grp) may add one more —
    // but never a join or explode
    assert(!plan.contains("Join") && !plan.contains("Generate"))
  }
}
