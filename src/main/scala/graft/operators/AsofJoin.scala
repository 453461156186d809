package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

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
  *
  * The matched right row is carried ATOMICALLY: payload columns + rightTs are
  * packed into a single struct and carried with one `last(struct, ignoreNulls)`,
  * so a right row containing NULL in one payload column still matches as a
  * whole row (per-column carry would mix values from different right rows).
  */
object AsofJoin {

  def asofJoin(left: DataFrame, right: DataFrame,
      leftTs: String, rightTs: String, by: Seq[(String, String)],
      tolerance: Option[Long] = None): DataFrame = {
    val lPayload = left.columns.filterNot(c => c == leftTs || by.exists(_._1 == c))
    val rPayload = right.columns.filterNot(c => c == rightTs || by.exists(_._2 == c))
    require(lPayload.intersect(rPayload).isEmpty,
      s"ambiguous payload columns: ${lPayload.intersect(rPayload).mkString(", ")}")
    require(!rPayload.contains("__rts"), "right payload column name `__rts` is reserved")

    val byNames = by.map(_._1)
    // the whole matched right row travels as one struct (atomic carry)
    val rStructFields = rPayload.map(c => right.schema(c)) :+
      right.schema(rightTs).copy(name = "__rts")
    val rStructType = StructType(rStructFields)
    val lTagged = left.select(
      by.map { case (l, _) => col(l) } ++
        Seq(col(leftTs).as("__ts"), lit(1).as("__side")) ++
        lPayload.map(col) :+
        lit(null).cast(rStructType).as("__rrow"): _*)
    val rTagged = right.select(
      by.map { case (l, r) => col(r).as(l) } ++
        Seq(col(rightTs).as("__ts"), lit(0).as("__side")) ++
        lPayload.map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        struct(rPayload.map(col) :+ col(rightTs).as("__rts"): _*).as("__rrow"): _*)

    // right rows sort before left rows at equal ts (side 0 < 1), so an
    // exactly-equal right timestamp is visible to the left row
    val w = Window.partitionBy(byNames.map(col): _*)
      .orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = lTagged.unionAll(rTagged)
      .withColumn("__c", last(col("__rrow"), ignoreNulls = true).over(w))

    val inTol = tolerance match {
      case Some(t) => col("__c").isNotNull && col("__c").getField("__rts") >= col("__ts") - t
      case None    => col("__c").isNotNull
    }
    carried.where(col("__side") === 1)
      .select(
        byNames.map(col) ++
          Seq(col("__ts").as(leftTs)) ++
          lPayload.map(col) ++
          rPayload.map(c => when(inTol, col("__c").getField(c)).as(c)) :+
          when(inTol, col("__c").getField("__rts")).as(rightTs): _*)
  }
}
