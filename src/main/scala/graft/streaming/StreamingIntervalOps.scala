package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.catalyst.expressions.GenericRow
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Streaming interval-set operators — the streaming variants of
  * [[graft.operators.IntervalOps.mergeIntervals]] / `gaps` (the reference's
  * `IntervalSet` union, `src/DataFrameIntervals.jl:385`, is batch-only).
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
    * provably complete (watermark past its stop). One documented
    * divergence: degenerate inputs (start >= stop, the empty set) are
    * dropped entirely and never counted — the batch operator would echo an
    * isolated one back AND count one absorbed by a run into its n_merged.
    *
    * @param tsCol  TimestampType event-time column carrying the interval
    *               START (e.g. `timestamp_micros(span.start div 1000)`);
    *               required for watermarking, as in the other streaming ops.
    */
  def mergeIntervalsStream(df: DataFrame, keys: Seq[String], spancol: String,
      tsCol: String, watermarkDelay: String): DataFrame = {
    val outSchema = StructType(keys.map(df.schema(_)) :+
      StructField(spancol, spanType, nullable = false) :+
      StructField("n_merged", LongType, nullable = false))
    val nKeys = keys.length
    runSweep(df, keys, spancol, tsCol, watermarkDelay, outSchema,
        trackLastStop = false) {
      (keysRow, closed, _) =>
        closed.iterator.map { case (s0, e0, n0) =>
          val buf = new Array[Any](nKeys + 2)
          var i = 0
          while (i < nKeys) { buf(i) = keysRow.get(i); i += 1 }
          buf(nKeys) = new GenericRow(Array[Any](s0, e0))
          buf(nKeys + 1) = n0
          new GenericRow(buf)
        }
    }
  }

  /** Streaming gaps (the complement of [[mergeIntervalsStream]]): one row
    * per maximal uncovered interval strictly between two consecutive closed
    * runs of a key — live downtime/silence detection. Emits
    * `keys..., span struct<start,stop>`; the region after the last run is
    * open-ended and never emits, matching the batch `gaps` contract. */
  def gapsStream(df: DataFrame, keys: Seq[String], spancol: String,
      tsCol: String, watermarkDelay: String): DataFrame = {
    val outSchema = StructType(keys.map(df.schema(_)) :+
      StructField(spancol, spanType, nullable = false))
    val nKeys = keys.length
    runSweep(df, keys, spancol, tsCol, watermarkDelay, outSchema,
        trackLastStop = true) {
      (keysRow, closed, lastStop) =>
        // closed runs arrive in start order; a gap spans [prev stop, next
        // start). lastStop is the previous invocation's final closed stop
        // (MinValue before the first run closes — no leading gap).
        var prev = lastStop
        closed.iterator.flatMap { case (s0, e0, _) =>
          val out =
            if (prev != Long.MinValue && s0 > prev) {
              val buf = new Array[Any](nKeys + 1)
              var i = 0
              while (i < nKeys) { buf(i) = keysRow.get(i); i += 1 }
              buf(nKeys) = new GenericRow(Array[Any](prev, s0))
              Iterator.single[Row](new GenericRow(buf))
            } else Iterator.empty
          prev = math.max(prev, e0)
          out
        }
    }
  }

  private val spanType = StructType(Seq(
    StructField("start", LongType, nullable = false),
    StructField("stop", LongType, nullable = false)))

  /** Shared per-key sweep: merges prior open runs with the batch's
    * intervals, splits closed/open on the watermark, keeps open runs (and,
    * when `trackLastStop`, the last closed stop — needed across idle
    * periods for gap emission, at the cost of one small state row per key;
    * without it, a fully-closed key's state is removed) in state, and
    * delegates emission to `emit`. `emit` receives (typed keys row, closed
    * runs in start order, the last closed stop BEFORE this invocation or
    * Long.MinValue). */
  private def runSweep(df: DataFrame, keys: Seq[String], spancol: String,
      tsCol: String, watermarkDelay: String, outSchema: StructType,
      trackLastStop: Boolean)(
      emit: (Row, Seq[(Long, Long, Long)], Long) => Iterator[Row]): DataFrame = {
    require(df.schema(tsCol).dataType == TimestampType,
      "streaming interval ops need a TimestampType event-time column (the interval start)")
    df.schema(spancol).dataType match {
      case StructType(fields) if fields.length == 2 &&
          fields.forall(f => Seq(LongType, IntegerType).contains(f.dataType)) => ()
      case other => throw new IllegalArgumentException(
        s"streaming interval ops need $spancol as struct<start,stop> long ns " +
          s"(timestamp structs would silently cast to SECONDS); got $other")
    }

    val tagged = df.withWatermark(tsCol, watermarkDelay)
      .select(CompositeKey.of(keys.map(col)).as("__key"),
        struct(keys.map(col): _*).as("__keys"),
        col(s"$spancol.start").cast("long").as("__s"),
        col(s"$spancol.stop").cast("long").as("__e"),
        col(tsCol))
      // NULL event times never advance the watermark — dropping them here
      // is pushdown-safe. Degenerate intervals are NOT filtered here: see
      // the in-function filter below.
      .where(col(tsCol).isNotNull)
    val keyed = tagged.groupByKey((r: Row) => r.getString(0))(Encoders.STRING)

    // state: (typed keys row, last closed stop, open runs (start, stop, n))
    keyed.flatMapGroupsWithState[(Row, Long, Seq[(Long, Long, Long)]), Row](
      OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
      (_: String, it: Iterator[Row],
          state: GroupState[(Row, Long, Seq[(Long, Long, Long)])]) =>
        val incoming = it.toArray
        // Degenerate intervals (start >= stop, the empty set — no coverage;
        // batch `gaps` filters them identically, batch merge counts them, a
        // divergence documented in the scaladoc) and null-endpoint rows are
        // dropped HERE, after the watermark collector has seen their event
        // times. A pre-groupByKey Filter on `__s < __e` does NOT stay above
        // the watermark: the optimizer splits the conjunction and pushes the
        // comparison below the EventTimeWatermark node, so a batch or tail
        // of degenerate-only rows would stop advancing the watermark and
        // open runs would close late or never.
        val valid = incoming.filter(r =>
          !r.isNullAt(2) && !r.isNullAt(3) && r.getLong(2) < r.getLong(3))
        val (priorKeys, lastStop, prior) =
          state.getOption.getOrElse((null: Row, Long.MinValue, Seq.empty[(Long, Long, Long)]))
        val keysRow = if (incoming.nonEmpty) incoming(0).getStruct(1) else priorKeys
        // one sorted sweep over prior open runs + this batch's intervals;
        // touching runs merge (start == stop), matching the batch operator
        val segs = (prior ++ valid.map(r => (r.getLong(2), r.getLong(3), 1L)))
          .sortBy(t => (t._1, t._2))
        val merged = new scala.collection.mutable.ArrayBuffer[(Long, Long, Long)]()
        segs.foreach { case (s0, e0, n0) =>
          if (merged.nonEmpty && s0 <= merged.last._2) {
            val (ps, pe, pn) = merged.last
            merged(merged.length - 1) = (ps, math.max(pe, e0), pn + n0)
          } else merged += ((s0, e0, n0))
        }
        // watermark 0 ms means "not established yet" (Spark also clamps at
        // epoch 0): close nothing rather than everything pre-epoch. Runs
        // over pre-1970 event times therefore never close — data should
        // use realistic epochs (the watermark itself cannot go negative).
        val wmMs = state.getCurrentWatermarkMs()
        val wmNs = if (wmMs == 0L) Long.MinValue else wmMs * 1000000L
        val (closed, open) = merged.partition(_._2 < wmNs)
        val newLastStop =
          if (closed.nonEmpty) math.max(lastStop, closed.map(_._2).max) else lastStop
        if (open.isEmpty && (!trackLastStop || newLastStop == Long.MinValue)) {
          state.remove()
        } else if (open.isEmpty) {
          // keep lastStop for future gap emission, but nothing can close
          // until new data for this key arrives — no timeout needed
          state.update((keysRow, newLastStop, Seq.empty))
        } else {
          state.update((keysRow, newLastStop, open.toSeq))
          // re-invoke this key once the watermark passes the earliest open
          // stop; clamp to the future — a pre-epoch stop would otherwise
          // target a timestamp behind the (non-negative) watermark
          state.setTimeoutTimestamp(
            math.max(open.map(_._2).min / 1000000L + 1L, wmMs + 1L))
        }
        emit(keysRow, closed.toSeq, lastStop)
    }(Encoders.kryo[(Row, Long, Seq[(Long, Long, Long)])], Encoders.row(outSchema))
  }
}
