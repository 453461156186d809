package graft

import org.apache.spark.sql.functions._
import graft.functions.Dedup

/** Cluster canonicalization: keep the highest-quality member per near-dup
  * component, ties to the smallest id. */
class CanonicalSpec extends SparkSuite {
  import spark.implicits._

  private def run(pairs: Seq[(Long, Long)], docs: Seq[(Long, Double)]) =
    Dedup.canonicalByQuality(
      pairs.toDF("a", "b"), docs.toDF("id", "quality"))
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4))))
      .toMap

  test("highest quality wins within a component; singletons keep themselves") {
    val out = run(
      pairs = Seq(1L -> 2L, 2L -> 3L),
      docs = Seq(1L -> 0.2, 2L -> 0.9, 3L -> 0.5, 4L -> 0.1))
    // component {1,2,3}: cluster = min id 1, canon = best quality doc 2
    assert(out(1L) == ((1L, 2L, 3L, false)))
    assert(out(2L) == ((1L, 2L, 3L, true)))
    assert(out(3L) == ((1L, 2L, 3L, false)))
    // 4 is a singleton
    assert(out(4L) == ((4L, 4L, 1L, true)))
  }

  test("quality ties break to the smallest id") {
    val out = run(Seq(7L -> 5L, 5L -> 9L),
      Seq(5L -> 0.5, 7L -> 0.5, 9L -> 0.5))
    assert(out.values.forall(_._2 == 5L))
    assert(out(5L)._4 && !out(7L)._4 && !out(9L)._4)
  }

  test("transitive chains merge into one component") {
    val chain = (0L until 20L).map(i => i -> (i + 1))
    val docs = (0L to 20L).map(i => i -> (i.toDouble / 100))
    val out = run(chain, docs)
    assert(out.values.map(_._1).toSet == Set(0L))   // one cluster, rep 0
    assert(out.values.map(_._2).toSet == Set(20L))  // best quality = id 20
    assert(out.count(_._2._4) == 1)
  }

  test("exactly one kept member per cluster, and it is the canon") {
    val out = run(Seq(1L -> 2L, 3L -> 4L),
      Seq(1L -> 0.1, 2L -> 0.2, 3L -> 0.4, 4L -> 0.3))
    out.groupBy(_._2._1).foreach { case (_, members) =>
      val kept = members.filter(_._2._4)
      assert(kept.size == 1)
      assert(kept.head._1 == kept.head._2._2)
    }
  }

  test("result is invariant to input partitioning") {
    val pairs = Seq(1L -> 2L, 2L -> 3L, 10L -> 11L)
    val docs = Seq(1L -> 0.3, 2L -> 0.1, 3L -> 0.8, 10L -> 0.5, 11L -> 0.5, 12L -> 0.0)
    val a = run(pairs, docs)
    val b = Dedup.canonicalByQuality(
      pairs.toDF("a", "b").repartition(5),
      docs.toDF("id", "quality").repartition(3))
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4))))
      .toMap
    assert(a == b)
  }
}
