package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.catalyst.expressions.GenericRow
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Streaming interval-set operators — the streaming variant of
  * [[graft.operators.IntervalOps.mergeIntervals]] (the reference's
  * `IntervalSet` union, `src/DataFrameIntervals.jl:385`, which is
  * batch-only).
  *
  * State design: per key, only the OPEN merged runs — runs whose stop the
  * watermark has not yet passed — are kept (`flatMapGroupsWithState` with
  * event-time timeout). A run with `stop < watermark` can never be extended
  * (any non-late future interval has `start >= watermark`, and touching
  * runs merge, so strictness matters), so it is emitted in append mode and
  * dropped from state. State per key is therefore bounded by the number of
  * concurrently-open runs inside the watermark horizon, not by stream
  * length. Late rows (event time behind the watermark) are merged into
  * whatever is still open or start a fresh run — the standard streaming
  * caveat: results are exact when data arrives within the watermark delay.
  */
object StreamingIntervalOps {

  /** Merge overlapping/touching intervals per key on a stream; emits
    * `keys..., span struct<start,stop> (long ns), n_merged` — the same
    * observable contract as the batch operator — once a merged run is
    * provably complete (watermark past its stop).
    *
    * @param tsCol  TimestampType event-time column carrying the interval
    *               START (e.g. `timestamp_micros(span.start div 1000)`);
    *               required for watermarking, as in the other streaming ops.
    */
  def mergeIntervalsStream(df: DataFrame, keys: Seq[String], spancol: String,
      tsCol: String, watermarkDelay: String): DataFrame = {
    require(df.schema(tsCol).dataType == TimestampType,
      "mergeIntervalsStream needs a TimestampType event-time column (the interval start)")
    val outSchema = StructType(keys.map(df.schema(_)) :+
      StructField(spancol, StructType(Seq(
        StructField("start", LongType, nullable = false),
        StructField("stop", LongType, nullable = false))), nullable = false) :+
      StructField("n_merged", LongType, nullable = false))

    // collision-free composite grouping key (see StreamingAsof: raw concat
    // collides across field boundaries and concat_ws skips NULLs)
    def keyExpr(cols: Seq[String]) =
      concat(cols.map { c =>
        val s = col(c).cast("string")
        when(s.isNull, lit("N")).otherwise(concat(lit("V"), length(s), lit(":"), s))
      }: _*)

    val tagged = df.withWatermark(tsCol, watermarkDelay)
      .select(keyExpr(keys).as("__key"),
        struct(keys.map(col): _*).as("__keys"),
        col(s"$spancol.start").cast("long").as("__s"),
        col(s"$spancol.stop").cast("long").as("__e"),
        col(tsCol))
    val keyed = tagged.groupByKey((r: Row) => r.getString(0))(Encoders.STRING)
    val nKeys = keys.length

    // state: (typed keys row, open runs as (start, stop, n_merged))
    keyed.flatMapGroupsWithState[(Row, Seq[(Long, Long, Long)]), Row](
      OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
      (_: String, it: Iterator[Row], state: GroupState[(Row, Seq[(Long, Long, Long)])]) =>
        val incoming = it.toArray
        val (priorKeys, prior) = state.getOption.getOrElse((null: Row, Seq.empty[(Long, Long, Long)]))
        val keysRow = if (incoming.nonEmpty) incoming(0).getStruct(1) else priorKeys
        // one sorted sweep over prior open runs + this batch's intervals;
        // touching runs merge (start == stop), matching the batch operator
        val segs = (prior ++ incoming.map(r => (r.getLong(2), r.getLong(3), 1L)))
          .sortBy(t => (t._1, t._2))
        val merged = new scala.collection.mutable.ArrayBuffer[(Long, Long, Long)]()
        segs.foreach { case (s0, e0, n0) =>
          if (merged.nonEmpty && s0 <= merged.last._2) {
            val (ps, pe, pn) = merged.last
            merged(merged.length - 1) = (ps, math.max(pe, e0), pn + n0)
          } else merged += ((s0, e0, n0))
        }
        val wmNs = state.getCurrentWatermarkMs() * 1000000L
        val (closed, open) = merged.partition(_._2 < wmNs)
        if (open.isEmpty) state.remove()
        else {
          state.update((keysRow, open.toSeq))
          // re-invoke this key once the watermark passes the earliest open
          // stop (stopMs >= wmMs for open runs, so the target is future)
          state.setTimeoutTimestamp(open.map(_._2).min / 1000000L + 1L)
        }
        closed.iterator.map { case (s0, e0, n0) =>
          val buf = new Array[Any](nKeys + 2)
          var i = 0
          while (i < nKeys) { buf(i) = keysRow.get(i); i += 1 }
          buf(nKeys) = new GenericRow(Array[Any](s0, e0))
          buf(nKeys + 1) = n0
          new GenericRow(buf)
        }
    }(Encoders.kryo[(Row, Seq[(Long, Long, Long)])], Encoders.row(outSchema))
      .toDF(keys :+ spancol :+ "n_merged": _*)
  }
}
