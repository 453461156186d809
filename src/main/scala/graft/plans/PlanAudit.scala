package graft.plans

import org.apache.spark.sql.DataFrame

/** Plan-shape introspection: the 100 TB viability checks PlanShapeSpec
  * applies to every shipped query, packaged as an API so USER pipelines can
  * gate their own plans in CI — "no cartesian product ever reaches the
  * cluster" as an assertion, not a code review hope.
  *
  * The audit reads the compiled physical plan (pre-execution; under AQE
  * this is the initial plan, which is exactly what static CI can see —
  * runtime re-optimization only ever improves on it, e.g. demoting a
  * sort-merge join to broadcast). Counts come from the plan's rendered
  * operator tree, the same surface `explain()` prints.
  */
object PlanAudit {

  /** One row of plan facts. `unpartitionedWindows` counts window operators
    * whose specification carries no PARTITION BY — the one-task global
    * sort that dies first at scale (bounded-domain frames are the
    * documented exception; the audit reports, the caller decides). */
  final case class Audit(
      cartesianProducts: Int,
      nestedLoopJoins: Int,
      exchanges: Int,
      broadcastExchanges: Int,
      unpartitionedWindows: Int,
      parquetScans: Int,
      wholeStageCodegenSpans: Int) {
    def scaleSafe(allowNestedLoop: Boolean = false): Boolean =
      cartesianProducts == 0 && (allowNestedLoop || nestedLoopJoins == 0)
  }

  def audit(df: DataFrame): Audit = {
    val plan = df.queryExecution.executedPlan.toString
    def count(re: String): Int = re.r.findAllIn(plan).size
    Audit(
      cartesianProducts = count("CartesianProduct"),
      nestedLoopJoins = count("BroadcastNestedLoopJoin"),
      exchanges = count("Exchange hashpartitioning|Exchange rangepartitioning|Exchange SinglePartition"),
      broadcastExchanges = count("BroadcastExchange"),
      unpartitionedWindows = countUnpartitionedWindows(plan),
      parquetScans = count("Scan parquet|FileScan parquet"),
      // the tree renderer prints a codegen'd operator as `*(<stageId>)`
      // (explain("formatted") would say WholeStageCodegen) — distinct
      // stage ids = codegen spans
      wholeStageCodegenSpans = "\\*\\((\\d+)\\)".r.findAllMatchIn(plan)
        .map(_.group(1)).toSet.size)
  }

  /** A spec with no PARTITION BY renders its ORDER BY expression FIRST:
    * `windowspecdefinition(x#1L ASC NULLS FIRST, ...)` — a partitioned spec
    * leads with bare partition expressions (no sort direction). The first
    * TOP-LEVEL argument is isolated by balanced-paren scanning (a bare
    * `[^,()]*` regex misses order keys that render with parens or commas —
    * arithmetic, CASE, function calls) and classified by its SortOrder
    * suffix, which Spark always renders as `<dir> NULLS <ordering>`. */
  private[plans] def countUnpartitionedWindows(plan: String): Int = {
    val marker = "windowspecdefinition("
    val sortSuffixes = Seq("ASC NULLS FIRST", "ASC NULLS LAST",
      "DESC NULLS FIRST", "DESC NULLS LAST")
    var idx = plan.indexOf(marker)
    var cnt = 0
    while (idx >= 0) {
      val start = idx + marker.length
      var depth = 0
      var i = start
      while (i < plan.length &&
        !(depth == 0 && (plan.charAt(i) == ',' || plan.charAt(i) == ')'))) {
        val c = plan.charAt(i)
        if (c == '(') depth += 1 else if (c == ')') depth -= 1
        i += 1
      }
      val firstArg = plan.substring(start, i).trim
      if (sortSuffixes.exists(firstArg.endsWith)) cnt += 1
      idx = plan.indexOf(marker, start)
    }
    cnt
  }

  /** Throw (with the offending plan attached) if the plan contains a
    * cartesian product, or a nested-loop join the caller did not
    * explicitly allow (broadcast-small frames are the legitimate use). */
  def assertScaleSafe(df: DataFrame, allowNestedLoop: Boolean = false): Unit = {
    val a = audit(df)
    if (!a.scaleSafe(allowNestedLoop))
      throw new IllegalStateException(
        s"plan is not scale-safe ($a):\n${df.queryExecution.executedPlan}")
  }
}
