package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.catalyst.expressions.GenericRow
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}
import org.apache.spark.sql.types._

/** Streaming multi-touch attribution — the online face of
  * [[graft.functions.EventOps.attribution]]: per key, a bounded touch
  * buffer over `flatMapGroupsWithState`; each CONVERSION emits its credit
  * rows the moment it arrives. State per key is ONLY the touches inside
  * the lookback window behind the latest seen event time (older ones are
  * evicted every batch), so memory is bounded by key cardinality × window
  * touch rate regardless of stream length.
  */
object StreamingAttribution {

  /** Emits one row per (conversion, touch) credit in append mode:
    * (keys..., channel, conv_id, pos, n, credit) — the per-conversion
    * detail whose per-channel DECIMAL rollup equals the batch operator's
    * output. Within a batch the group's events process in (ts, tie)
    * order; across batches the result equals the batch operator whenever
    * events arrive in event-time order (the standard streaming exactness
    * caveat, same as [[StreamingFunnel]]): a touch arriving AFTER a
    * conversion it should have credited is not retroactively credited,
    * and a touch older than the eviction horizon is gone. Credit math is
    * the batch operator's verbatim: linear 1/n, or position-based
    * 0.4/0.4/0.2-split, each credit rounded 6 dp. */
  def attributionStream(df: DataFrame, keyCols: Seq[String], typeCol: String,
      tsCol: String, tieCol: String, touchTypes: Seq[String],
      convType: String, lookback: Long, model: String): DataFrame = {
    require(lookback > 0, s"attributionStream requires lookback > 0, got $lookback")
    require(Seq("linear", "position").contains(model),
      s"unknown attribution model `$model` (expected linear or position)")
    require(touchTypes.nonEmpty && !touchTypes.contains(convType),
      "touchTypes must be non-empty and must not contain convType")
    require(df.schema(tsCol).dataType == LongType,
      "attributionStream requires a long event-time column")
    require(df.schema(tieCol).dataType == LongType,
      "attributionStream requires a long tie/id column")

    val outSchema = StructType(
      keyCols.map(df.schema(_)) ++ Seq(
        StructField("channel", StringType, nullable = false),
        StructField("conv_id", LongType, nullable = false),
        StructField("pos", IntegerType, nullable = false),
        StructField("n", IntegerType, nullable = false),
        StructField("credit", DoubleType, nullable = false)))

    val touchSet = touchTypes.toSet
    val tagged = df
      .where(col(typeCol).isin(touchTypes :+ convType: _*))
      .select(
        CompositeKey.of(keyCols.map(df(_))).as("key"),
        col(tsCol).cast("long").as("ts"),
        col(tieCol).cast("long").as("tie"),
        col(typeCol).cast("string").as("et"),
        struct(keyCols.map(col): _*).as("keys"))

    val keyed = tagged.groupByKey((r: Row) => r.getString(0))(Encoders.STRING)
    val nKey = keyCols.length

    def credit(pos: Int, n: Int): Double = {
      val raw = model match {
        case "linear" => 1.0 / n
        case "position" =>
          if (n == 1) 1.0
          else if (n == 2) 0.5
          else if (pos == 1 || pos == n) 0.4
          else 0.2 / (n.toDouble - 2.0)
      }
      BigDecimal(raw).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }

    val out = keyed.flatMapGroupsWithState[Array[(String, Long, Long)], Row](
      org.apache.spark.sql.streaming.OutputMode.Append(),
      GroupStateTimeout.NoTimeout()) {
      (_: String, it: Iterator[Row],
       state: GroupState[Array[(String, Long, Long)]]) =>
        var buf = state.getOption.getOrElse(Array.empty[(String, Long, Long)])
          .toVector
        val rows = it.toArray.sortBy(r => (r.getLong(1), r.getLong(2)))
        var maxTs = buf.lastOption.map(_._2).getOrElse(Long.MinValue)
        val emitted = Vector.newBuilder[Row]
        rows.foreach { r =>
          val ts = r.getLong(1); val tie = r.getLong(2)
          val et = r.getString(3); val keys = r.getStruct(4)
          if (ts > maxTs) maxTs = ts
          if (touchSet(et)) {
            buf = buf :+ ((et, ts, tie))
          } else {
            // conversion: credit the buffered touches inside the window,
            // in (ts, tie) order — the buffer is append-ordered by the
            // in-batch sort + ordered arrival, so it IS that order
            val window = buf.filter { case (_, tt, _) =>
              tt >= ts - lookback && tt < ts }
            val n = window.size
            window.zipWithIndex.foreach { case ((ch, _, _), i) =>
              val b = new Array[Any](nKey + 5)
              var j = 0
              while (j < nKey) { b(j) = keys.get(j); j += 1 }
              b(nKey) = ch; b(nKey + 1) = tie
              b(nKey + 2) = i + 1; b(nKey + 3) = n
              b(nKey + 4) = credit(i + 1, n)
              emitted += new GenericRow(b)
            }
          }
        }
        val horizon = maxTs - lookback
        val kept = buf.filter(_._2 >= horizon)
        if (kept.nonEmpty) state.update(kept.toArray)
        else if (state.exists) state.remove()
        emitted.result().iterator
    }(Encoders.kryo[Array[(String, Long, Long)]], Encoders.row(outSchema))

    out.toDF(keyCols ++ Seq("channel", "conv_id", "pos", "n", "credit"): _*)
  }
}
