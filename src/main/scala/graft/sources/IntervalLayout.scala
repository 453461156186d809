package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.intervals.IntervalCols

/** Interval-aware parquet layout: the write/read pair that makes interval
  * predicates partition-prunable at 100 TB.
  *
  * Layout: rows are hive-partitioned by `__bucket = floor(start / binWidth)`
  * and sorted by `start` within files. An interval can be longer than one
  * bucket, so pruning by bucket range alone would miss rows that START in an
  * earlier bucket but still overlap the probe window; the writer therefore
  * records the corpus-wide maximum interval length in a `_graft_layout.json`
  * sidecar, and the reader widens the probed bucket range by that bound —
  * pruning is then provably lossless:
  * any row overlapping `[qlo, qhi)` has `start > qlo - maxLen` and
  * `start < qhi`, i.e. lives in a bucket within the widened range.
  *
  * At cluster scale this is the difference between scanning every file and
  * touching only `O((qhi - qlo + maxLen) / binWidth)` partitions; the
  * within-file sort additionally feeds parquet min/max row-group stats, so
  * the residual `start < qhi` filter prunes row groups inside the boundary
  * buckets. Skew note: one hive partition per bucket — pick `binWidth` so a
  * bucket holds at most a few file-split's worth of rows.
  */
object IntervalLayout {

  private val MetaFile = "_graft_layout.json"

  /** Exact floor division for long ticks (negative-safe; `div` truncates
    * toward zero which would off-by-one the negative buckets). */
  private def floorDiv(c: org.apache.spark.sql.Column, w: Long) =
    (c - pmod(c, lit(w))) / w

  def write(df: DataFrame, path: String, spancol: String, binWidth: Long,
      mode: String = "overwrite"): Unit = {
    require(binWidth > 0, "binWidth must be positive")
    val s = col(s"$spancol.start")
    val e = col(s"$spancol.stop")
    val maxLenRow = df.agg(max(e - s)).head()
    val maxLen = if (maxLenRow.isNullAt(0)) 0L else maxLenRow.getLong(0)
    df.withColumn("__bucket", floorDiv(s, binWidth).cast("long"))
      .repartition(col("__bucket"))
      .sortWithinPartitions(s)
      .write.partitionBy("__bucket").mode(mode).parquet(path)
    // sidecar next to the parquet footer files, through the same FS layer
    val spark = df.sparkSession
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(new org.apache.hadoop.fs.Path(path, MetaFile), true)
    out.write(s"""{"binWidth":$binWidth,"maxLen":$maxLen}""".getBytes("UTF-8"))
    out.close()
  }

  /** Read rows overlapping `[qlo, qhi)`: bucket-range partition pruning
    * (widened by the recorded maxLen) + the exact residual overlap filter. */
  def readOverlapping(spark: SparkSession, path: String, spancol: String,
      qlo: Long, qhi: Long): DataFrame = {
    val (binWidth, maxLen) = readMeta(spark, path)
    val loBucket = Math.floorDiv(qlo - maxLen, binWidth)
    val hiBucket = Math.floorDiv(qhi - 1, binWidth)
    spark.read.parquet(path)
      .where(col("__bucket").between(loBucket, hiBucket))
      .where(IntervalCols.overlaps(col(spancol),
        IntervalCols.interval(lit(qlo), lit(qhi))))
      .drop("__bucket")
  }

  def readMeta(spark: SparkSession, path: String): (Long, Long) = {
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(new org.apache.hadoop.fs.Path(path, MetaFile))
    val txt = scala.io.Source.fromInputStream(in, "UTF-8").mkString
    in.close()
    val m = """"binWidth":(-?\d+),"maxLen":(-?\d+)""".r.findFirstMatchIn(txt)
      .getOrElse(throw new IllegalStateException(s"malformed $MetaFile: $txt"))
    (m.group(1).toLong, m.group(2).toLong)
  }
}
