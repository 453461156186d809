package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.catalyst.expressions.GenericRow
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}
import org.apache.spark.sql.types._

/** Streaming first-touch funnel — the online face of
  * [[graft.functions.EventOps.funnel]]: per key, a forward-only stage
  * machine over `flatMapGroupsWithState`. State is ONE fixed-width array
  * of stage times per key (never per event), so memory is bounded by key
  * cardinality × stage count regardless of stream length.
  */
object StreamingFunnel {

  /** Emits one row per key PER MICRO-BATCH IN WHICH THE FUNNEL ADVANCED:
    * (key, t_<stage>... , stage_reached) in append mode. Within a batch
    * the group's events are processed in event-time order, so a whole
    * view→click→purchase sequence inside one batch advances all three
    * stages at their exact batch-operator times. Stages only move FORWARD:
    * once stage k is set, later (or late-arriving earlier) events can
    * never rewrite it — the final emitted row per key equals the batch
    * [[graft.functions.EventOps.funnel]] whenever events arrive in
    * event-time order across batches (the standard streaming exactness
    * caveat, same as [[StreamingAsof]]); a strictly-late stage event is
    * simply ignored. The strict `>` advance rule matches the batch
    * operator (a click at the view's exact instant does not advance). */
  def funnelStream(df: DataFrame, keyCols: Seq[String], typeCol: String,
      tsCol: String, stages: Seq[String]): DataFrame = {
    require(stages.size >= 2, "funnelStream requires at least two stages")
    require(stages.distinct.size == stages.size, "duplicate funnel stages")
    require(df.schema(tsCol).dataType == LongType,
      "funnelStream requires a long (ns) event-time column")

    val outSchema = StructType(
      keyCols.map(df.schema(_)) ++
        stages.map(s => StructField(s"t_$s", LongType, nullable = true)) :+
        StructField("stage_reached", IntegerType, nullable = false))

    val tagged = df.select(
      CompositeKey.of(keyCols.map(df(_))).as("key"),
      col(tsCol).cast("long").as("ts"),
      col(typeCol).cast("string").as("et"),
      struct(keyCols.map(col): _*).as("keys"))

    val keyed = tagged.groupByKey((r: Row) => r.getString(0))(Encoders.STRING)
    val nKey = keyCols.length
    val nStages = stages.length
    val stageIdx = stages.zipWithIndex.toMap

    val out = keyed.flatMapGroupsWithState[Array[Long], Row](
      org.apache.spark.sql.streaming.OutputMode.Append(),
      GroupStateTimeout.NoTimeout()) {
      (_: String, it: Iterator[Row], state: GroupState[Array[Long]]) =>
        // Long.MinValue = unreached (event times are epoch ns, all greater)
        val times = state.getOption.getOrElse(Array.fill(nStages)(Long.MinValue))
        val before = times.count(_ != Long.MinValue)
        val rows = it.toArray.sortBy(_.getLong(1))
        var keys: Row = null
        rows.foreach { r =>
          keys = r.getStruct(3)
          stageIdx.get(r.getString(2)).foreach { k =>
            val frontier = times.indexWhere(_ == Long.MinValue)
            if (k == frontier && frontier >= 0) {
              val t = r.getLong(1)
              if (k == 0 || t > times(k - 1)) times(k) = t
            }
          }
        }
        val after = times.count(_ != Long.MinValue)
        if (after > before) {
          state.update(times)
          val buf = new Array[Any](nKey + nStages + 1)
          var i = 0
          while (i < nKey) { buf(i) = keys.get(i); i += 1 }
          var j = 0
          while (j < nStages) {
            buf(nKey + j) = if (times(j) == Long.MinValue) null else times(j)
            j += 1
          }
          buf(nKey + nStages) = after
          Iterator.single(new GenericRow(buf))
        } else Iterator.empty
    }(Encoders.kryo[Array[Long]], Encoders.row(outSchema))

    out.toDF(keyCols ++ stages.map(s => s"t_$s") :+ "stage_reached": _*)
  }
}
