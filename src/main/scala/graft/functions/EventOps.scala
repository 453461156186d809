package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-sequence analytics over keyed, timestamped event streams: funnel
  * progression and gaps-and-islands run detection — the product-analytics
  * pair next to [[graft.operators.IntervalOps.sessionize]].
  */
object EventOps {

  /** Ordered funnel: for each key, the first time each stage fired GIVEN
    * the previous stage had already fired strictly earlier. Output: one row
    * per key that reached stage 1, with `t_<stage>` columns (NULL from the
    * first unreached stage on). The strict `>` ordering means a click at
    * the exact view instant does NOT advance the funnel — re-entrancy is
    * deliberately not modeled (first-touch attribution).
    *
    * Distributed shape at 100 TB: one filtered min-aggregate per stage
    * (map-side-combining, key-keyed) and stage-count equi-joins between
    * per-key AGGREGATES (key-cardinality-sized, not event-sized) — the
    * event stream is scanned once per stage with the stage filter pushed
    * into the scan, and never self-joined at event granularity. Stage
    * count is small and static (funnels are 3-7 steps), so the linear
    * join chain is bounded. */
  def funnel(df: DataFrame, keys: Seq[String], typeCol: String, tsCol: String,
      stages: Seq[String]): DataFrame = {
    require(stages.size >= 2, "funnel requires at least two stages")
    require(stages.distinct.size == stages.size, "duplicate funnel stages")
    val outNames = stages.map(s => s"t_$s")
    outNames.foreach(n => require(!df.columns.contains(n),
      s"funnel reserves output column `$n`"))
    val head = df.where(col(typeCol) === stages.head)
      .groupBy(keys.map(col): _*)
      .agg(min(col(tsCol)).as(outNames.head))
    stages.zip(outNames).sliding(2).foldLeft(head) {
      case (acc, Seq((_, prevOut), (stage, out))) =>
        val next = df.where(col(typeCol) === stage)
          .select(keys.map(col) :+ col(tsCol).as("__t"): _*)
          .join(acc.select(keys.map(col) :+ col(prevOut): _*), keys)
          .where(col("__t") > col(prevOut))
          .groupBy(keys.map(col): _*)
          .agg(min(col("__t")).as(out))
        acc.join(next.select(keys.map(col) :+ col(out): _*), keys, "left")
      case (acc, _) => acc
    }
  }

  /** Gaps-and-islands: maximal runs of CONSECUTIVE integer ids per key —
    * missing-sequence detection (dropped events, retention gaps, missing
    * file parts). One row per island: (keys..., run_start, run_end,
    * run_len), half-open NOT — run_end is inclusive (ids, not instants).
    *
    * The classic `id - row_number()` trick: within a key, consecutive ids
    * share the difference, so the group-by recovers each run without a
    * self-join. ONE key-keyed shuffle; the island group-by reuses the
    * window's partitioning. `idCol` values must be unique per key. */
  def islands(df: DataFrame, keys: Seq[String], idCol: String): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col("__id"))
    df.select(keys.map(col) :+ col(idCol).as("__id"): _*)
      .withColumn("__grp", col("__id") - row_number().over(w))
      .groupBy(keys.map(col) :+ col("__grp"): _*)
      .agg(min("__id").as("run_start"), max("__id").as("run_end"),
        count(lit(1)).as("run_len"))
      .drop("__grp")
  }
}
