package graft

import org.apache.spark.sql.functions._
import graft.plans.PlanAudit

/** PlanAudit: the plan-shape CI gate as a library API. */
class PlanAuditSpec extends SparkSuite {
  import spark.implicits._

  test("audit flags cartesian and nested-loop; equi-join passes") {
    val a = Seq((1L, "x")).toDF("id", "s")
    val b = Seq((1L, "y")).toDF("id2", "t")
    val cart = a.crossJoin(b)
    assert(PlanAudit.audit(cart).nestedLoopJoins +
      PlanAudit.audit(cart).cartesianProducts > 0)
    intercept[IllegalStateException] { PlanAudit.assertScaleSafe(cart) }
    PlanAudit.assertScaleSafe(cart, allowNestedLoop = true)
    val equi = a.join(b, col("id") === col("id2"))
    assert(PlanAudit.audit(equi).scaleSafe())
    PlanAudit.assertScaleSafe(equi)
  }

  test("audit counts unpartitioned vs partitioned windows") {
    import org.apache.spark.sql.expressions.Window
    val df = Seq((1L, "a"), (2L, "b")).toDF("v", "g")
    val unp = df.withColumn("r",
      row_number().over(Window.orderBy("v")))
    assert(PlanAudit.audit(unp).unpartitionedWindows >= 1)
    val part = df.withColumn("r",
      row_number().over(Window.partitionBy("g").orderBy("v")))
    assert(PlanAudit.audit(part).unpartitionedWindows == 0)
    assert(PlanAudit.audit(part).exchanges >= 1)
  }

  test("window audit handles order keys that render with parens/commas") {
    import org.apache.spark.sql.expressions.Window
    val df = Seq((1L, "a"), (2L, "b")).toDF("v", "g")
    // arithmetic order key renders as `(v#1L + 1) ASC NULLS FIRST` — the
    // old [^,()]* regex missed it
    val unpArith = df.withColumn("r",
      row_number().over(Window.orderBy(col("v") + 1)))
    assert(PlanAudit.audit(unpArith).unpartitionedWindows >= 1)
    val unpCase = df.withColumn("r", row_number().over(
      Window.orderBy(when(col("g") === "a", col("v")).otherwise(-col("v")))))
    assert(PlanAudit.audit(unpCase).unpartitionedWindows >= 1)
    // partitioned by an expression, ordered by an expression: still 0
    val partArith = df.withColumn("r", row_number().over(
      Window.partitionBy(concat(col("g"), lit("_"))).orderBy(col("v") + 1)))
    assert(PlanAudit.audit(partArith).unpartitionedWindows == 0)
  }

  test("shipped plans audit clean: q08 is scale-safe; codegen spans visible on a final plan") {
    val df = SparkEntry.queries("q08_interval_join_binned")(spark,
      "/root/testdata/sf0.001")
    assert(PlanAudit.audit(df).scaleSafe())
    // under AQE the pre-execution string hides codegen spans (they appear
    // in the runtime-final plan); a shuffle-free plan shows them directly
    val simple = spark.range(10).select((col("id") + 1).as("x"))
    assert(PlanAudit.audit(simple).wholeStageCodegenSpans > 0)
  }
}
