package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scale-safe numeric band join: pairs within `|a - b| <= delta`.
  *
  * The naive plan for a band predicate is a theta-join — Spark can only
  * run it as BroadcastNestedLoopJoin (O(n·m) comparisons, build side
  * must fit in memory) or a cartesian product. That is the value-space
  * analogue of the interval-overlap problem the binned strategy of
  * `IntervalJoin` solves in time-space (reference semantics:
  * `/root/reference/src/DataFrameIntervals.jl:97` — overlap joins are
  * equi-joins after discretization), so the same trick applies: bucket
  * each value at width `delta` (`floor(v / delta)`), replicate the LEFT
  * side into its bucket and both neighbors, equi-join on the bucket id,
  * and re-check the exact predicate. Any qualifying pair differs by at
  * most `delta` < one bucket width, so the right row's bucket is within
  * ±1 of the left's — the candidate set is provably complete, and the
  * join is a plain shuffled (or broadcast) hash equi-join that
  * partitions by bucket across executors, with AQE free to split a hot
  * bucket.
  *
  * Cost: 3× replication of the left side (vs n·m comparisons); skew
  * follows the value distribution — a value attracting > ~1/32 of the
  * data warrants a smaller delta or the salted variant.
  *
  * Bucket ids are computed in the value's own double arithmetic
  * (`floor(v / delta)` as a long), identical on any engine; the exact
  * predicate re-check makes bucket-boundary rounding irrelevant to the
  * output (a candidate surfacing in two neighbor buckets is emitted
  * once — the replicated side deduplicates by construction because each
  * (left-bucket, right-bucket) combination is distinct).
  */
object BandJoin {

  /** Inner band join: all (left, right) pairs with
    * `|left(valueCol) - right(valueCol)| <= delta`, optionally also
    * matching on equi `keys`. Column-name clashes must be resolved by
    * the caller (select/alias) — both inputs' columns survive.
    */
  def bandJoin(left: DataFrame, right: DataFrame, valueCol: String,
      delta: Double, keys: Seq[String] = Nil,
      rightValueCol: Option[String] = None): DataFrame = {
    require(delta > 0 && !delta.isNaN && !delta.isInfinite,
      s"bandJoin: delta must be a positive finite number, got $delta")
    val rv = rightValueCol.getOrElse(valueCol)
    require(!left.columns.contains("__band"),
      "bandJoin: left frame already has the reserved column __band")
    require(!right.columns.contains("__band"),
      "bandJoin: right frame already has the reserved column __band")
    def bucket(c: Column): Column = floor(c / lit(delta)).cast("long")
    // left replicated into {b-1, b, b+1}; right keeps its single bucket
    val l = left.withColumn("__band",
      explode(array(bucket(col(valueCol)) - 1, bucket(col(valueCol)),
        bucket(col(valueCol)) + 1)))
    val r = right.withColumn("__band", bucket(col(rv)))
    val joinKeys = keys :+ "__band"
    l.join(r, joinKeys)
      .where(abs(col(valueCol) - col(rv)) <= lit(delta))
      .drop("__band")
  }
}
