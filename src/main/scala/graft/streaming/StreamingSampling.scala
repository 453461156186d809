package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.functions.TextFunctions

/** Streaming budget admission — the online variant of
  * [[graft.functions.Sampling.capByBudget]]: documents are admitted as they
  * ARRIVE until the per-stratum running value total (counting every seen
  * row, admitted or not — the batch operator's strict-prefix rule) exceeds
  * the budget; once a stratum's total passes the budget, nothing from that
  * stratum is admitted again.
  *
  * Semantics vs batch: the batch operator admits the prefix of the salted
  * hash-shuffle order; an unbounded stream cannot be reordered, so here the
  * admission order is arrival order (micro-batch sequence), with rows
  * inside one batch taken in the batch operator's (hash, key) order. When
  * all data arrives in a single batch the admitted set equals the batch
  * operator's exactly (pinned by StreamingSpec).
  *
  * State: ONE long per stratum (the cumulative seen total) — bounded by the
  * stratum cardinality regardless of stream volume; no watermark or timeout
  * bookkeeping, so this runs forever at constant memory.
  */
object StreamingSampling {

  /** One output row per ADMITTED document: (id, stratum, v). `keyCol` must
    * cast to long and be unique per doc; `valueCol` must be non-null and
    * nonnegative (negative values fail the query rather than corrupting
    * the running total). Pass `strataCol = None` for one global budget. */
  def capByBudgetOnline(df: DataFrame, keyCol: String, valueCol: String,
      budget: Long, strataCol: Option[String] = None,
      salt: String = "budget"): DataFrame = {
    require(budget >= 0L, s"budget must be nonnegative: $budget")
    val stratum = strataCol.map(col(_).cast("string")).getOrElse(lit(""))
    val hkey = TextFunctions.tokenHashMod(
      concat(lit(s"$salt:"), col(keyCol).cast("string")))
    val in = df.select(stratum.as("s"), col(keyCol).cast("long").as("id"),
        col(valueCol).cast("long").as("v"), hkey.as("h"))
      .as(Encoders.tuple(Encoders.STRING, Encoders.scalaLong,
        Encoders.scalaLong, Encoders.scalaLong))
    in.groupByKey(_._1)(Encoders.STRING)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (s: String, rows: Iterator[(String, Long, Long, Long)],
            state: GroupState[Long]) =>
          var cum = state.getOption.getOrElse(0L)
          // within one micro-batch, take rows in the batch operator's
          // (hash, key) order so a single-batch stream reproduces it
          val out = rows.toArray.sortBy(r => (r._4, r._2)).flatMap {
            case (_, id, v, _) =>
              require(v >= 0L,
                s"capByBudgetOnline requires nonnegative values, got $v (id=$id)")
              cum += v // every seen row counts — the strict-prefix rule
              if (cum <= budget) Some((id, s, v)) else None
          }
          state.update(cum)
          out.iterator
      }(Encoders.scalaLong, Encoders.product[(Long, String, Long)])
      .toDF("id", "stratum", "v")
  }
}
