package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Interval-set operators: merge (union) of overlapping/touching intervals
  * per key — the general form of the reference's `IntervalSet`/`superset`
  * span math (`src/DataFrameIntervals.jl:385`) — and gap-based
  * sessionization of point events into intervals.
  *
  * Both use the same shuffle-lean shape: one hash partition by key, one
  * in-partition sort, a running-max/lag window to flag group starts, a
  * running sum to number groups, then a partial-aggregating groupBy.
  * No self-join, no explode; scales as a single sort-based window pass.
  */
object IntervalOps {

  /** Coalesce overlapping AND touching half-open intervals per key:
    * `[a,b) ∪ [b,c) = [a,c)`. Output: key columns, merged `spancol`,
    * `n_merged` source-interval count. */
  def mergeIntervals(df: DataFrame, keys: Seq[String], spancol: String): DataFrame = {
    val s = col(s"$spancol.start")
    val e = col(s"$spancol.stop")
    val byKey = Window.partitionBy(keys.map(col): _*).orderBy(s, e)
    val runMax = max(e).over(byKey.rowsBetween(Window.unboundedPreceding, -1))
    val isNew = when(runMax.isNull || s > runMax, 1L).otherwise(0L)
    val grp = sum(isNew).over(byKey.rowsBetween(Window.unboundedPreceding, 0))
    df.withColumn("__grp", grp)
      .groupBy(keys.map(col) :+ col("__grp"): _*)
      .agg(min(s).as("__ms"), max(e).as("__me"), count(lit(1)).as("n_merged"))
      .select(keys.map(col) :+
        struct(col("__ms").as("start"), col("__me").as("stop")).as(spancol) :+
        col("n_merged"): _*)
  }

  /** Total covered duration per key after merging (interval-set measure —
    * overlap counted once). */
  def coveredDuration(df: DataFrame, keys: Seq[String], spancol: String): DataFrame =
    mergeIntervals(df, keys, spancol)
      .groupBy(keys.map(col): _*)
      .agg(sum(col(s"$spancol.stop") - col(s"$spancol.start")).as("covered"))

  /** Gaps (interval-set complement between covered regions) per key: one
    * row per maximal uncovered interval strictly between two merged
    * intervals — downtime/silence detection. Same single sort-based pass
    * as the merge; no self-join. */
  def gaps(df: DataFrame, keys: Seq[String], spancol: String): DataFrame = {
    val merged = mergeIntervals(df, keys, spancol)
    val byKey = Window.partitionBy(keys.map(col): _*).orderBy(col(s"$spancol.start"))
    merged
      .withColumn("__pe", lag(col(s"$spancol.stop"), 1).over(byKey))
      .where(col("__pe").isNotNull && col("__pe") < col(s"$spancol.start"))
      .select(keys.map(col) :+
        struct(col("__pe").as("start"), col(s"$spancol.start").as("stop")).as(spancol): _*)
  }

  /** Gap-based sessionization: point events (`tsCol`, long ns) split into
    * sessions per key wherever the gap to the previous event exceeds
    * `gapNs`. Output: keys, session `struct<start,stop>` (stop = last event
    * + `padNs`), event count. */
  def sessionize(df: DataFrame, keys: Seq[String], tsCol: String, gapNs: Long,
      orderTiebreak: Seq[String] = Seq.empty, padNs: Long = 0L): DataFrame = {
    val orderCols = col(tsCol) +: orderTiebreak.map(col)
    val byKey = Window.partitionBy(keys.map(col): _*).orderBy(orderCols: _*)
    val prev = lag(col(tsCol), 1).over(byKey)
    val isNew = when(prev.isNull || col(tsCol) - prev > gapNs, 1L).otherwise(0L)
    val sess = sum(isNew).over(byKey.rowsBetween(Window.unboundedPreceding, 0))
    df.withColumn("__sess", sess)
      .groupBy(keys.map(col) :+ col("__sess"): _*)
      .agg(min(col(tsCol)).as("__ss"), max(col(tsCol)).as("__se"),
        count(lit(1)).as("n_events"))
      .select(keys.map(col) :+ col("__sess").as("session") :+
        struct(col("__ss").as("start"), (col("__se") + padNs).as("stop")).as("span") :+
        col("n_events"): _*)
  }
}
