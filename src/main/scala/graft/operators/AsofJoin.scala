package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** As-of join: for each left row, the single matching right row within the
  * same `by` key (beyond the reference's surface, SURVEY §2.2 "as-of not
  * needed for parity"). Three directions:
  *
  *  - [[Direction.Backward]] (default): greatest `rightTs <= leftTs` — the
  *    shape time-series stores call ASOF JOIN.
  *  - [[Direction.Forward]]: smallest `rightTs >= leftTs`.
  *  - [[Direction.Nearest]]: whichever of the two is closer in time
  *    (tie → backward).
  *
  * Spark-first plan without any range join: tag both sides, UNION them, and
  * run ONE window pass per `by` key ordered by (ts, side) carrying the last
  * seen right row forward (`last(_, ignoreNulls)` over unbounded-preceding);
  * the forward direction is the same pass with the sort reversed, and
  * Nearest evaluates both windows over the SAME exchange (one shuffle, two
  * in-partition sorts). Cost = one shuffle on `by` + sort — the same shape
  * as a sort-merge join, no nested loop. An optional `tolerance` (ns) drops
  * matches farther than `tolerance` from `leftTs` (on the match's side).
  *
  * The matched right row is carried ATOMICALLY: payload columns + rightTs are
  * packed into a single struct and carried with one `last(struct, ignoreNulls)`,
  * so a right row containing NULL in one payload column still matches as a
  * whole row (per-column carry would mix values from different right rows).
  */
object AsofJoin {

  sealed trait Direction
  object Direction {
    case object Backward extends Direction
    case object Forward extends Direction
    case object Nearest extends Direction
  }

  def asofJoin(left: DataFrame, right: DataFrame,
      leftTs: String, rightTs: String, by: Seq[(String, String)],
      tolerance: Option[Long] = None,
      direction: Direction = Direction.Backward): DataFrame = {
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

    // backward scan: ts asc; forward scan: ts desc. In BOTH, right rows
    // (side 0) sort before left rows at equal ts, so an exactly-equal right
    // timestamp is visible to the left row.
    //
    // (ts, side) alone is not a TOTAL order: several right rows on one
    // (key, ts) tick would be carried arbitrarily (partition-layout-
    // dependent). The carried struct itself is the tiebreak — the MAX
    // (payload..., rightTs) struct wins the tick, a rule an oracle can
    // reproduce (max_by / arg-max of the same struct). Skipped only when the
    // payload contains an unorderable type (map); then ties stay arbitrary.
    val tiebreakable =
      org.apache.spark.sql.catalyst.expressions.RowOrdering.isOrderable(rStructType)
    def carry(forward: Boolean): Column = {
      val base =
        if (forward) Seq(col("__ts").desc, col("__side").asc)
        else Seq(col("__ts").asc, col("__side").asc)
      val ord = if (tiebreakable) base :+ col("__rrow").asc_nulls_first else base
      val w = Window.partitionBy(byNames.map(col): _*)
        .orderBy(ord: _*)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      last(col("__rrow"), ignoreNulls = true).over(w)
    }
    def inTol(c: Column, forward: Boolean): Column = tolerance match {
      case Some(t) =>
        if (forward) c.isNotNull && c.getField("__rts") <= col("__ts") + t
        else c.isNotNull && c.getField("__rts") >= col("__ts") - t
      case None => c.isNotNull
    }

    val unioned = lTagged.unionAll(rTagged)
    val (carried, chosen) = direction match {
      case Direction.Backward =>
        val df = unioned.withColumn("__b", carry(forward = false))
        (df, when(inTol(col("__b"), forward = false), col("__b")))
      case Direction.Forward =>
        val df = unioned.withColumn("__f", carry(forward = true))
        (df, when(inTol(col("__f"), forward = true), col("__f")))
      case Direction.Nearest =>
        // both windows share the partitioning exchange; tie prefers backward
        val df = unioned
          .withColumn("__b", carry(forward = false))
          .withColumn("__f", carry(forward = true))
        val bOk = inTol(col("__b"), forward = false)
        val fOk = inTol(col("__f"), forward = true)
        val bDist = col("__ts") - col("__b").getField("__rts")
        val fDist = col("__f").getField("__rts") - col("__ts")
        (df, when(bOk && (!fOk || bDist <= fDist), col("__b"))
          .when(fOk, col("__f")))
    }

    carried.withColumn("__c", chosen)
      .where(col("__side") === 1)
      .select(
        byNames.map(col) ++
          Seq(col("__ts").as(leftTs)) ++
          lPayload.map(col) ++
          rPayload.map(c => col("__c").getField(c).as(c)) :+
          col("__c").getField("__rts").as(rightTs): _*)
  }
}
