package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) layout: interleave the bits of two integer dimensions so
  * ONE sort key clusters BOTH — the multi-dimensional locality trick behind
  * Delta/Iceberg `OPTIMIZE ZORDER`. Files written in z order carry tight
  * parquet min/max ranges on each dimension simultaneously, so point/range
  * predicates on EITHER column prune files; a plain lexicographic sort only
  * ever prunes its leading column. The z-value is pure codegen'd bit
  * arithmetic (mask, shift, or) — no UDF, no shuffle beyond the one
  * range-partition of the write itself — and being deterministic integer
  * math it replays exactly in any engine. */
object ZOrderLayout {

  /** Morton code of two non-negative integers, `bits` bits each (bit i of x
    * lands at 2i, bit i of y at 2i+1). Inputs are masked to `bits` (callers
    * bucket/clamp first — masking wraps, which is the right behavior for
    * already-bounded dims and a documented hazard otherwise). bits <= 31 so
    * the result fits a positive long. */
  def zValue(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"zValue requires 1 <= bits <= 31, got $bits")
    val mask = (1L << bits) - 1
    val xm = x.cast("long").bitwiseAND(lit(mask))
    val ym = y.cast("long").bitwiseAND(lit(mask))
    (0 until bits).map { i =>
      shiftleft(xm.bitwiseAND(lit(1L << i)), i)
        .bitwiseOR(shiftleft(ym.bitwiseAND(lit(1L << i)), i + 1))
    }.reduce(_.bitwiseOR(_))
  }

  /** Write `df` as parquet z-ordered on (xCol, yCol): range-partition by the
    * z-value into `numFiles` output files, sort within each, drop the key.
    * Range partitioning (not hash) keeps z-adjacent rows in the SAME file —
    * that adjacency is what makes both dimensions' min/max tight. */
  def writeZOrdered(df: DataFrame, path: String, xCol: String, yCol: String,
      bits: Int, numFiles: Int): Unit = {
    require(numFiles >= 1, s"writeZOrdered requires numFiles >= 1, got $numFiles")
    require(!df.columns.contains("__z"), "this operator reserves `__z`")
    df.withColumn("__z", zValue(col(xCol), col(yCol), bits))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }
}
