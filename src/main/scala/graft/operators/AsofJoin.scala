package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, the single right row with the greatest
  * `rightTs <= leftTs` within the same `by` key (backward as-of; the shape
  * time-series stores call ASOF JOIN — beyond the reference's surface,
  * SURVEY §2.2 "as-of not needed for parity").
  *
  * Spark-first plan without any range join: tag both sides, UNION them, and
  * run ONE window pass per `by` key ordered by (ts, side) carrying the last
  * seen right row forward (`last(_, ignoreNulls)` over unbounded-preceding).
  * Cost = one shuffle on `by` + one sort — the same shape as a sort-merge
  * join, no nested loop, no per-key skew beyond the window sort. An
  * optional `tolerance` (ns) drops matches older than `leftTs - tolerance`.
  */
object AsofJoin {

  def asofJoin(left: DataFrame, right: DataFrame,
      leftTs: String, rightTs: String, by: Seq[(String, String)],
      tolerance: Option[Long] = None): DataFrame = {
    val lPayload = left.columns.filterNot(c => c == leftTs || by.exists(_._1 == c))
    val rPayload = right.columns.filterNot(c => c == rightTs || by.exists(_._2 == c))
    require(lPayload.intersect(rPayload).isEmpty,
      s"ambiguous payload columns: ${lPayload.intersect(rPayload).mkString(", ")}")

    val byNames = by.map(_._1)
    val lTagged = left.select(
      by.map { case (l, _) => col(l) } ++
        Seq(col(leftTs).as("__ts"), lit(1).as("__side")) ++
        lPayload.map(col) ++
        rPayload.map(c => lit(null).cast(right.schema(c).dataType).as(c)) :+
        lit(null).cast(right.schema(rightTs).dataType).as("__rts"): _*)
    val rTagged = right.select(
      by.map { case (l, r) => col(r).as(l) } ++
        Seq(col(rightTs).as("__ts"), lit(0).as("__side")) ++
        lPayload.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        rPayload.map(col) :+
        col(rightTs).as("__rts"): _*)

    // right rows sort before left rows at equal ts (side 0 < 1), so an
    // exactly-equal right timestamp is visible to the left row
    val w = Window.partitionBy(byNames.map(col): _*)
      .orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = lTagged.unionAll(rTagged)
      .select(col("*") +:
        (rPayload.map(c => last(col(c), ignoreNulls = true).over(w).as(s"__c_$c")) :+
          last(col("__rts"), ignoreNulls = true).over(w).as("__c_rts")): _*)

    val inTol = tolerance match {
      case Some(t) => col("__c_rts").isNotNull && col("__c_rts") >= col("__ts") - t
      case None    => col("__c_rts").isNotNull
    }
    carried.where(col("__side") === 1)
      .select(
        byNames.map(col) ++
          Seq(col("__ts").as(leftTs)) ++
          lPayload.map(col) ++
          rPayload.map(c => when(inTol, col(s"__c_$c")).as(c)) :+
          when(inTol, col("__c_rts")).as(rightTs): _*)
  }
}
