package graft

import org.apache.spark.sql.functions._
import graft.operators.SkewJoin

class SkewJoinSpec extends SparkSuite {
  import spark.implicits._

  // Zipfian-ish probe: one hot key with 50 rows, a tail of singletons,
  // plus a dangling key with no build-side match
  lazy val probe = ((1 to 50).map(i => (1L, s"hot$i")) ++
    (2L to 20L).map(k => (k, s"tail$k")) :+ ((99L, "dangling")))
    .toDF("k", "pv")
  lazy val build = (1L to 25L).map(k => (k, s"dim$k")).toDF("k", "bv")

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.select("k", "pv", "bv").collect()
      .map(r => s"${r.get(0)}|${r.get(1)}|${r.get(2)}").sorted.toSeq

  test("saltedJoin inner: row-identical to the plain join, incl. hot-key multiplicity") {
    val plain = probe.join(build, Seq("k"), "inner")
    val salted = SkewJoin.saltedJoin(probe, build, Seq("k"), nSalts = 4)
    assert(canon(salted) == canon(plain))
    assert(salted.count() == 50 + 19) // hot key keeps all 50 matches
  }

  test("saltedJoin left: unmatched probe rows surface exactly once") {
    val plain = probe.join(build, Seq("k"), "left")
    val salted = SkewJoin.saltedJoin(probe, build, Seq("k"), nSalts = 3,
      joinType = "left")
    assert(canon(salted) == canon(plain))
    assert(salted.where(col("k") === 99L).count() == 1)
  }

  test("saltedJoin: deterministic under repartitioning; nSalts=1 degenerates to the plain join") {
    val a = canon(SkewJoin.saltedJoin(probe.repartition(7), build, Seq("k"), 4))
    val b = canon(SkewJoin.saltedJoin(probe.repartition(2), build, Seq("k"), 4))
    assert(a == b)
    assert(canon(SkewJoin.saltedJoin(probe, build, Seq("k"), 1)) ==
      canon(probe.join(build, Seq("k"), "inner")))
  }

  test("saltedJoin plan: build side replicated via explode, join keys carry the salt") {
    val plan = SkewJoin.saltedJoin(probe, build, Seq("k"), 4)
      .queryExecution.executedPlan.toString
    assert(plan.contains("__salt"))
    assert(plan.contains("Generate explode") || plan.contains("Generate"),
      s"no replication Generate in:\n$plan")
  }

  test("saltedJoin guards: outer build types, reserved column, missing key") {
    intercept[IllegalArgumentException] {
      SkewJoin.saltedJoin(probe, build, Seq("k"), 4, joinType = "full")
    }
    intercept[IllegalArgumentException] {
      SkewJoin.saltedJoin(probe.withColumn("__salt", lit(1)), build, Seq("k"), 4)
    }
    intercept[IllegalArgumentException] {
      SkewJoin.saltedJoin(probe, build, Seq("nope"), 4)
    }
  }
}
