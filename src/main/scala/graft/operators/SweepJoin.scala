package graft.operators

import java.util.{Arrays => JArrays, PriorityQueue}
import scala.collection.mutable.ArrayBuffer
import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The v3 physical strategy for the interval overlap join (SURVEY §4.3):
  * a distributed sorted-endpoint plane sweep — the reference's own
  * algorithm (`Intervals.find_intersections`, delegated at
  * `src/DataFrameIntervals.jl:10-12`) re-expressed as a range-partitioned
  * per-partition sweep.
  *
  * Shape:
  *  1. one stats pass picks BALANCED partition bounds = approximate
  *     quantiles of all interval starts (so dense time regions get more
  *     partitions — immune to start-domain skew, unlike fixed-width bins);
  *  2. each interval replicates to every partition range it overlaps
  *     (typically 1-2 — same replication factor as the binned strategy);
  *  3. within each partition, rows stream in (start) order through ONE
  *     merge sweep holding stop-ordered active lists per side: each
  *     arriving row pairs with every live opposite row, evicting actives
  *     whose stop has passed. O((n+m)·log(active) + k) per partition,
  *     memory bounded by the maximum overlap concurrency, output streamed
  *     through the iterator (never materialized per partition);
  *  4. a pair is emitted only where the LATER start lives (its first
  *     partition) — the cross-partition dedup is a single comparison, no
  *     distinct shuffle.
  *
  * Degenerate intervals (start >= stop = empty set) are dropped on entry —
  * identical to the other strategies' semantics. Inner join only; outer
  * variants use the binned path.
  */
object SweepJoin {

  /** Approximate start-quantile bounds from a bounded reservoir sample
    * (`k` values per input partition, one narrow pass, collect size =
    * k × partitions regardless of data volume — unlike a fraction-based
    * sample, this stays driver-safe at any scale). Per-partition reservoirs
    * slightly bias toward small partitions; for PARTITION bounds a ~2x
    * balance approximation is ample — residual imbalance only shifts work
    * between ranges, never correctness. Measured ~4x cheaper than
    * approxQuantile on the same input. */
  private[operators] def partitionBounds(df: DataFrame, startCol: String,
      nParts: Int, perPartition: Int = 64): Array[Long] = {
    if (nParts <= 1) return Array.empty
    val sampled = df.select(col(startCol))
      .where(col(startCol).isNotNull) // NULLs possible with checkMissing=false
      .as(Encoders.scalaLong)
      .mapPartitions { it =>
        val rng = new scala.util.Random(org.apache.spark.TaskContext.getPartitionId().toLong)
        val buf = new Array[Long](perPartition)
        var n = 0
        it.foreach { x =>
          if (n < perPartition) buf(n) = x
          else { val j = rng.nextInt(n + 1); if (j < perPartition) buf(j) = x }
          n += 1
        }
        buf.take(math.min(n, perPartition)).iterator
      }(Encoders.scalaLong)
      .collect().sorted
    if (sampled.isEmpty) Array.empty
    else (1 until nParts)
      .map(i => sampled((i.toLong * sampled.length / nParts).toInt))
      .distinct.sorted.toArray
  }

  /** pid of the range containing x: #bounds <= x. */
  private def pidOf(bounds: Array[Long], x: Long): Int = {
    val i = JArrays.binarySearch(bounds, x)
    if (i >= 0) {
      // bounds may contain duplicates pre-`distinct`; binarySearch returns
      // SOME matching index — advance past equal values for "count <= x"
      var j = i
      while (j < bounds.length && bounds(j) <= x) j += 1
      j
    } else -(i + 1)
  }

  /** Inner overlap join of the temp-named projected frames (same contract
    * as the other strategies: output columns = l2.columns ++ r2.columns). */
  def sweepInner(l2: DataFrame, r2: DataFrame, lOnT: String, rOnT: String): DataFrame = {
    val spark = l2.sparkSession
    val nParts = math.max(spark.sessionState.conf.numShufflePartitions, 1)

    val starts = l2.select(col(s"$lOnT.start").as("s"))
      .unionAll(r2.select(col(s"$rOnT.start").as("s")))
    val bounds = partitionBounds(starts, "s", nParts)

    val lSchema = l2.schema
    val rSchema = r2.schema
    val outSchema = StructType(lSchema.fields ++ rSchema.fields)
    val packedSchema = StructType(Seq(
      StructField("pid", IntegerType, nullable = false),
      StructField("s", LongType, nullable = false),
      StructField("e", LongType, nullable = false),
      StructField("side", IntegerType, nullable = false),
      StructField("lrow", lSchema, nullable = true),
      StructField("rrow", rSchema, nullable = true)))

    def pack(df: DataFrame, onT: String, side: Int) = {
      val cols = df.columns.map(col)
      val self = struct(cols: _*)
      df.select(
        col(s"$onT.start").as("s"), col(s"$onT.stop").as("e"),
        lit(side).as("side"),
        (if (side == 0) self else lit(null).cast(lSchema)).as("lrow"),
        (if (side == 1) self else lit(null).cast(rSchema)).as("rrow"))
        // NULL endpoints (possible only with checkMissing = false) match
        // nothing in an inner join — drop them BEFORE the typed flatMap,
        // which reads s/e as primitive longs
        .where(col("s").isNotNull && col("e").isNotNull)
    }

    val tagged = pack(l2, lOnT, 0).unionAll(pack(r2, rOnT, 1))

    // replicate each non-degenerate interval to the partition ranges it
    // overlaps: pid(start) .. pid(stop - 1)
    val bcBounds = bounds // serialized into the task closures
    val replicated = tagged.flatMap { row =>
      val s = row.getLong(0)
      val e = row.getLong(1)
      if (s >= e) Iterator.empty
      else {
        val p0 = pidOf(bcBounds, s)
        val p1 = pidOf(bcBounds, e - 1)
        (p0 to p1).iterator.map(p => Row(p, s, e, row.getInt(2), row.get(3), row.get(4)))
      }
    }(Encoders.row(packedSchema))

    val sorted = replicated
      .repartition(math.max(bounds.length + 1, 1), col("pid"))
      .sortWithinPartitions(col("pid"), col("s"))

    val nL = lSchema.length
    val nR = rSchema.length
    val swept = sorted.mapPartitions { it =>
      new Iterator[Row] {
        // (stop, payload) actives per side, evicted by ascending stop
        final class Active(val e: Long, val s: Long, val payload: Row)
        val ord = new java.util.Comparator[Active] {
          def compare(a: Active, b: Active): Int = java.lang.Long.compare(a.e, b.e)
        }
        var curPid = -1
        var pidLow = Long.MinValue
        val lAct = new PriorityQueue[Active](ord)
        val rAct = new PriorityQueue[Active](ord)
        // pending pairs hold the two payload refs; the output Row is ONE
        // reused buffer — SerializeFromObject copies each row to unsafe
        // storage before pulling the next, so reuse is safe and saves two
        // allocations per emitted pair (measured GC-sensitive at 29M pairs)
        val pending = new ArrayBuffer[(Row, Row)]()
        var pendingIdx = 0
        val buf = new Array[Any](nL + nR)
        val out = new org.apache.spark.sql.catalyst.expressions.GenericRow(buf)

        private def refill(): Unit = {
          pending.clear(); pendingIdx = 0
          while (pending.isEmpty && it.hasNext) {
            val row = it.next()
            val pid = row.getInt(0)
            if (pid != curPid) {
              curPid = pid
              pidLow = if (pid == 0) Long.MinValue else bcBounds(pid - 1)
              lAct.clear(); rAct.clear()
            }
            val s = row.getLong(1)
            val e = row.getLong(2)
            val side = row.getInt(3)
            while (!lAct.isEmpty && lAct.peek().e <= s) lAct.poll()
            while (!rAct.isEmpty && rAct.peek().e <= s) rAct.poll()
            val mine = if (side == 0) row.getStruct(4) else row.getStruct(5)
            // the later-start row (this one) decides emission: only in the
            // partition where its own start lives (cross-partition dedup)
            if (s >= pidLow) {
              val opp = if (side == 0) rAct else lAct
              val oi = opp.iterator()
              while (oi.hasNext) {
                val o = oi.next()
                pending += (if (side == 0) (mine, o.payload) else (o.payload, mine))
              }
            }
            (if (side == 0) lAct else rAct).add(new Active(e, s, mine))
          }
        }

        def hasNext: Boolean = {
          if (pendingIdx < pending.length) true
          else { refill(); pendingIdx < pending.length }
        }
        def next(): Row = {
          val (l, r) = pending(pendingIdx)
          pendingIdx += 1
          var i = 0
          while (i < nL) { buf(i) = l.get(i); i += 1 }
          var j = 0
          while (j < nR) { buf(nL + j) = r.get(j); j += 1 }
          out
        }
      }
    }(Encoders.row(outSchema))

    swept.toDF()
  }
}
