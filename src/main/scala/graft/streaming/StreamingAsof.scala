package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.catalyst.expressions.GenericRow
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}
import org.apache.spark.sql.types._

/** Streaming backward as-of join (the streaming variant of
  * [[graft.operators.AsofJoin]]) built on `flatMapGroupsWithState` — the
  * custom-state primitive: both sides union into one keyed stream; the
  * per-key state is the single LATEST right row seen so far (its event
  * time + payload), so state size is bounded by the key cardinality, one
  * row each, with no watermark bookkeeping needed.
  *
  * Semantics: within a micro-batch the group's rows are processed in
  * (ts, side) order with right rows first at equal ts — exactly the batch
  * operator's visibility rule. Across micro-batches, a right row that
  * arrives AFTER a left row was already emitted cannot retroactively
  * rewrite it (standard streaming as-of: results are correct w.r.t.
  * arrival, exact when sides arrive in event-time order). An optional
  * `tolerance` (ns on the ts column's own unit) drops stale matches.
  */
object StreamingAsof {

  def asofJoinStream(left: DataFrame, right: DataFrame,
      leftTs: String, rightTs: String, by: Seq[(String, String)],
      tolerance: Option[Long] = None): DataFrame = {
    val lPayload = left.columns.filterNot(c => c == leftTs || by.exists(_._1 == c))
    val rPayload = right.columns.filterNot(c => c == rightTs || by.exists(_._2 == c))
    require(lPayload.intersect(rPayload).isEmpty,
      s"ambiguous payload columns: ${lPayload.intersect(rPayload).mkString(", ")}")

    require(leftTs != rightTs,
      "leftTs and rightTs must have distinct names (both appear in the output)")
    require(left.schema(leftTs).dataType == LongType &&
      right.schema(rightTs).dataType == LongType,
      "streaming as-of requires long (ns) event-time columns")
    val byNames = by.map(_._1)
    val lSchema = StructType(lPayload.map(left.schema(_)))
    val rSchema = StructType(rPayload.map(right.schema(_)) :+
      right.schema(rightTs).copy(name = "__rts"))

    def keyExpr(cols: Seq[String], df: DataFrame) =
      CompositeKey.of(cols.map(df(_)))

    val lTagged = left.select(
      keyExpr(by.map(_._1), left).as("key"),
      col(leftTs).cast("long").as("ts"), lit(1).as("side"),
      struct(lPayload.map(col): _*).as("lrow"),
      lit(null).cast(rSchema).as("rrow"),
      struct(by.map { case (l, _) => col(l) }: _*).as("keys"))
    val rTagged = right.select(
      keyExpr(by.map(_._2), right).as("key"),
      col(rightTs).cast("long").as("ts"), lit(0).as("side"),
      lit(null).cast(lSchema).as("lrow"),
      struct(rPayload.map(col) :+ col(rightTs).as("__rts"): _*).as("rrow"),
      struct(by.map { case (l, r) => col(r).as(l) }: _*).as("keys"))

    val outSchema = StructType(
      byNames.map(n => left.schema(n)) ++
        Seq(left.schema(leftTs)) ++
        lPayload.map(left.schema(_)) ++
        rPayload.map(c => right.schema(c).copy(nullable = true)) :+
        right.schema(rightTs).copy(nullable = true))

    val keyed = lTagged.unionAll(rTagged)
      .groupByKey((r: Row) => r.getString(0))(Encoders.STRING)

    val nBy = byNames.length
    val nL = lPayload.length
    val nR = rPayload.length
    val tol = tolerance

    val out = keyed.flatMapGroupsWithState[(Long, Row), Row](
      org.apache.spark.sql.streaming.OutputMode.Append(),
      GroupStateTimeout.NoTimeout()) {
      (_: String, it: Iterator[Row], state: GroupState[(Long, Row)]) =>
        // batch-local ordering: ts asc, right rows before left at equal ts
        val rows = it.toArray.sortBy(r => (r.getLong(1), r.getInt(2)))
        var cur: (Long, Row) = state.getOption.orNull
        val acc = new scala.collection.mutable.ArrayBuffer[Row]()
        rows.foreach { r =>
          if (r.getInt(2) == 0) {
            val ts = r.getLong(1)
            if (cur == null || ts >= cur._1) cur = (ts, r.getStruct(4))
          } else {
            val ts = r.getLong(1)
            val matched = cur != null && cur._2 != null &&
              tol.forall(t => cur._1 >= ts - t)
            val buf = new Array[Any](nBy + 1 + nL + nR + 1)
            val keys = r.getStruct(5)
            var i = 0
            while (i < nBy) { buf(i) = keys.get(i); i += 1 }
            buf(nBy) = r.get(1) // left ts (long)
            val lrow = r.getStruct(3)
            var j = 0
            while (j < nL) { buf(nBy + 1 + j) = lrow.get(j); j += 1 }
            if (matched) {
              val rrow = cur._2
              var k = 0
              while (k < nR) { buf(nBy + 1 + nL + k) = rrow.get(k); k += 1 }
              buf(nBy + 1 + nL + nR) = rrow.get(nR) // __rts
            }
            acc += new GenericRow(buf)
          }
        }
        // No placeholder state when this batch had only left rows: a
        // (MinValue, null) sentinel would make a later batch's `matched`
        // check pass and then NPE dereferencing the null row. NoTimeout
        // state needs no keep-alive update.
        if (cur != null) state.update(cur)
        acc.iterator
    }(Encoders.kryo[(Long, Row)], Encoders.row(outSchema))

    out.toDF((byNames :+ leftTs) ++ lPayload ++ rPayload :+ rightTs: _*)
  }

  /** Streaming FORWARD as-of join (the streaming variant of the batch
    * operator's `Direction.Forward`): each left row matches the EARLIEST
    * right row with `rts >= lts` (ties included). A left row cannot resolve
    * when it arrives — it buffers per key until the next right row; each
    * right row, processed in event-time order, resolves every pending left
    * at or before it. With a `tolerance`, a first-right beyond it emits the
    * left UNMATCHED (no later right can be earlier, given in-order rights).
    * State per key = the pending (yet-unresolved) left rows — bounded by
    * the left arrival rate between right arrivals, not stream length; a
    * left with no subsequent right ever stays pending (exactness caveat as
    * the backward variant: results are exact when sides arrive in
    * event-time order). */
  def asofJoinStreamForward(left: DataFrame, right: DataFrame,
      leftTs: String, rightTs: String, by: Seq[(String, String)],
      tolerance: Option[Long] = None): DataFrame = {
    val lPayload = left.columns.filterNot(c => c == leftTs || by.exists(_._1 == c))
    val rPayload = right.columns.filterNot(c => c == rightTs || by.exists(_._2 == c))
    require(lPayload.intersect(rPayload).isEmpty,
      s"ambiguous payload columns: ${lPayload.intersect(rPayload).mkString(", ")}")
    require(leftTs != rightTs,
      "leftTs and rightTs must have distinct names (both appear in the output)")
    require(left.schema(leftTs).dataType == LongType &&
      right.schema(rightTs).dataType == LongType,
      "streaming as-of requires long (ns) event-time columns")
    val byNames = by.map(_._1)
    val lSchema = StructType(lPayload.map(left.schema(_)))
    val rSchema = StructType(rPayload.map(right.schema(_)) :+
      right.schema(rightTs).copy(name = "__rts"))

    // side: LEFT 0 / right 1 — at equal ts the left buffers first so the
    // same-ts right resolves it (forward allows rts == lts)
    val lTagged = left.select(
      CompositeKey.of(by.map(p => left(p._1))).as("key"),
      col(leftTs).cast("long").as("ts"), lit(0).as("side"),
      struct(lPayload.map(col): _*).as("lrow"),
      lit(null).cast(rSchema).as("rrow"),
      struct(by.map { case (l, _) => col(l) }: _*).as("keys"))
    val rTagged = right.select(
      CompositeKey.of(by.map(p => right(p._2))).as("key"),
      col(rightTs).cast("long").as("ts"), lit(1).as("side"),
      lit(null).cast(lSchema).as("lrow"),
      struct(rPayload.map(col) :+ col(rightTs).as("__rts"): _*).as("rrow"),
      struct(by.map { case (l, r) => col(r).as(l) }: _*).as("keys"))

    val outSchema = StructType(
      byNames.map(n => left.schema(n)) ++
        Seq(left.schema(leftTs)) ++
        lPayload.map(left.schema(_)) ++
        rPayload.map(c => right.schema(c).copy(nullable = true)) :+
        right.schema(rightTs).copy(nullable = true))

    val keyed = lTagged.unionAll(rTagged)
      .groupByKey((r: Row) => r.getString(0))(Encoders.STRING)
    val nBy = byNames.length
    val nL = lPayload.length
    val nR = rPayload.length
    val tol = tolerance

    // state: pending left rows as (lts, left payload, typed keys)
    val out = keyed.flatMapGroupsWithState[Seq[(Long, Row, Row)], Row](
      org.apache.spark.sql.streaming.OutputMode.Append(),
      GroupStateTimeout.NoTimeout()) {
      (_: String, it: Iterator[Row], state: GroupState[Seq[(Long, Row, Row)]]) =>
        val rows = it.toArray.sortBy(r => (r.getLong(1), r.getInt(2)))
        val acc = new scala.collection.mutable.ArrayBuffer[Row]()
        var pending = state.getOption.getOrElse(Seq.empty)
          .toBuffer[(Long, Row, Row)]
        def emit(lts: Long, lrow: Row, keys: Row, rrow: Row): Unit = {
          val buf = new Array[Any](nBy + 1 + nL + nR + 1)
          var i = 0
          while (i < nBy) { buf(i) = keys.get(i); i += 1 }
          buf(nBy) = lts
          var j = 0
          while (j < nL) { buf(nBy + 1 + j) = lrow.get(j); j += 1 }
          if (rrow != null) {
            var k = 0
            while (k < nR) { buf(nBy + 1 + nL + k) = rrow.get(k); k += 1 }
            buf(nBy + 1 + nL + nR) = rrow.get(nR) // __rts
          }
          acc += new GenericRow(buf)
        }
        rows.foreach { r =>
          if (r.getInt(2) == 0) {
            pending += ((r.getLong(1), r.getStruct(3), r.getStruct(5)))
          } else {
            val rts = r.getLong(1)
            val rrow = r.getStruct(4)
            val (resolve, keep) = pending.partition(_._1 <= rts)
            resolve.foreach { case (lts, lrow, keys) =>
              // this is the FIRST right at/after lts: beyond tolerance
              // means no right can ever be closer — emit unmatched now
              emit(lts, lrow, keys,
                if (tol.forall(t => rts - lts <= t)) rrow else null)
            }
            pending = keep
          }
        }
        if (pending.nonEmpty) state.update(pending.toSeq) else state.remove()
        acc.iterator
    }(Encoders.kryo[Seq[(Long, Row, Row)]], Encoders.row(outSchema))

    out.toDF((byNames :+ leftTs) ++ lPayload ++ rPayload :+ rightTs: _*)
  }
}
