package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.catalyst.expressions.GenericRow
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}
import org.apache.spark.sql.types._

/** Streaming event-transition pairs — the online feed of the batch Markov
  * matrix (q113): each event emits its `(from, to)` edge against the key's
  * PREVIOUS event. State per key is one (ts, type) tuple forever —
  * bounded by key cardinality, not stream length; the downstream
  * transition-count aggregate composes as a normal streaming groupBy.
  */
object StreamingTransitions {

  /** Emits one append row per event EXCEPT each key's first:
    * (keys..., from_type, to_type, t). Within a micro-batch the group's
    * rows process in event-time order, so an in-batch burst yields exactly
    * the batch lag-pair stream; across batches the last (ts, type) carries
    * in state. Exact vs the batch operator when events arrive in
    * event-time order (the [[StreamingAsof]] caveat); a late event chains
    * onto the latest SEEN event rather than its true predecessor. */
  def transitionsStream(df: DataFrame, keyCols: Seq[String], typeCol: String,
      tsCol: String): DataFrame = {
    require(df.schema(tsCol).dataType == LongType,
      "transitionsStream requires a long (ns) event-time column")
    val outSchema = StructType(
      keyCols.map(df.schema(_)) ++ Seq(
        StructField("from_type", StringType, nullable = true),
        StructField("to_type", StringType, nullable = true),
        StructField("t", LongType, nullable = false)))

    val tagged = df.select(
      CompositeKey.of(keyCols.map(df(_))).as("key"),
      col(tsCol).cast("long").as("ts"),
      col(typeCol).cast("string").as("et"),
      struct(keyCols.map(col): _*).as("keys"))
    val keyed = tagged.groupByKey((r: Row) => r.getString(0))(Encoders.STRING)
    val nKey = keyCols.length

    val out = keyed.flatMapGroupsWithState[(Long, String), Row](
      org.apache.spark.sql.streaming.OutputMode.Append(),
      GroupStateTimeout.NoTimeout()) {
      (_: String, it: Iterator[Row], state: GroupState[(Long, String)]) =>
        var prev: (Long, String) = state.getOption.orNull
        val acc = new scala.collection.mutable.ArrayBuffer[Row]()
        it.toArray.sortBy(_.getLong(1)).foreach { r =>
          val ts = r.getLong(1)
          if (prev != null) {
            val keys = r.getStruct(3)
            val buf = new Array[Any](nKey + 3)
            var i = 0
            while (i < nKey) { buf(i) = keys.get(i); i += 1 }
            buf(nKey) = prev._2
            buf(nKey + 1) = r.getString(2)
            buf(nKey + 2) = ts
            acc += new GenericRow(buf)
          }
          prev = (ts, r.getString(2))
        }
        state.update(prev)
        acc.iterator
    }(Encoders.kryo[(Long, String)], Encoders.row(outSchema))

    out.toDF(keyCols ++ Seq("from_type", "to_type", "t"): _*)
  }
}
