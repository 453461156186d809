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
    * toward zero which would off-by-one the negative buckets). Integer math
    * all the way — the numerator is an exact multiple of `w`, and dividing
    * it as DECIMAL keeps quotients exact where a double `/` loses ulps past
    * 2^53 and silently misbuckets (breaking lossless pruning). */
  private def floorDiv(c: org.apache.spark.sql.Column, w: Long) =
    ((c - pmod(c, lit(w))).cast(org.apache.spark.sql.types.DecimalType(38, 0)) / lit(w))
      .cast("long")

  def write(df: DataFrame, path: String, spancol: String, binWidth: Long,
      mode: String = "overwrite"): Unit = {
    require(binWidth > 0, "binWidth must be positive")
    val s = col(s"$spancol.start")
    val e = col(s"$spancol.stop")
    val maxLenRow = df.agg(max(e - s)).head()
    // getAs[Number]: integral endpoint types narrower than long also work
    val batchMaxLen =
      if (maxLenRow.isNullAt(0)) 0L else maxLenRow.getAs[Number](0).longValue()
    // append must keep the WIDEST maxLen ever written (and one binWidth):
    // a narrower new batch would otherwise shrink the reader's widening
    // bound and silently prune earlier long intervals
    val maxLen =
      if (mode == "append") readMetaIfPresent(df.sparkSession, path) match {
        case Some((w0, m0)) =>
          require(w0 == binWidth,
            s"append binWidth $binWidth != existing layout binWidth $w0")
          math.max(m0, batchMaxLen)
        case None => batchMaxLen
      } else batchMaxLen
    // Append writes the sidecar BEFORE the data commit: maxLen only ever
    // GROWS on append, so a crash between the two steps leaves the bound
    // conservatively wide (rows of the half-written batch aren't visible
    // yet) — lossless pruning is preserved. The reverse order would leave
    // maxLen smaller than the appended data's true max — a silent pruning
    // hole. Overwrite keeps data-then-sidecar (an interrupted overwrite is
    // corrupt parquet regardless; the fresh sidecar must describe the fresh
    // data). Sidecar maintenance is a read-modify-write: concurrent appends
    // to one layout are NOT supported (standard single-writer parquet-layout
    // semantics — same contract as Hive-style partition overwrites).
    if (mode == "append") writeSidecar(df.sparkSession, path, binWidth, maxLen)
    df.withColumn("__bucket", floorDiv(s, binWidth))
      .repartition(col("__bucket"))
      .sortWithinPartitions(s)
      .write.partitionBy("__bucket").mode(mode).parquet(path)
    if (mode != "append") writeSidecar(df.sparkSession, path, binWidth, maxLen)
  }

  /** Atomic sidecar publish: write a temp file, then rename over the target
    * with OVERWRITE — readers see either the old or the new complete JSON,
    * never a torn write and never a missing file (a delete-then-rename pair
    * would expose a no-sidecar window to concurrent readers). Overwriting
    * rename is atomic on HDFS and posix; on object stores it degrades to
    * copy+delete, which still never exposes partial content. */
  private def writeSidecar(spark: SparkSession, path: String,
      binWidth: Long, maxLen: Long): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new org.apache.hadoop.fs.Path(path).getFileSystem(conf)
    val target = new org.apache.hadoop.fs.Path(path, MetaFile)
    val tmp = new org.apache.hadoop.fs.Path(path,
      s".$MetaFile.tmp-${java.util.UUID.randomUUID()}")
    val out = fs.create(tmp, true)
    out.write(s"""{"binWidth":$binWidth,"maxLen":$maxLen}""".getBytes("UTF-8"))
    out.close()
    org.apache.hadoop.fs.FileContext.getFileContext(target.toUri, conf)
      .rename(tmp, target, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
  }

  private def readMetaIfPresent(spark: SparkSession, path: String): Option[(Long, Long)] = {
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(new org.apache.hadoop.fs.Path(path, MetaFile)))
      Some(readMeta(spark, path))
    else None
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

  /** Pre-binned bucketed table: each row exploded to the fixed-origin bins
    * `floor(start/binWidth) .. floor((stop-1)/binWidth)` and saved bucketed
    * AND sorted by `__bin`. Two tables written with the same `binWidth` and
    * `nBuckets` then join on `__bin` with NO exchange and NO sort — the
    * repeated-join pattern (a static reference set probed by every pipeline
    * run) pays the shuffle once at write time instead of per query.
    *
    * The bin origin is fixed at epoch 0 (not the corpus minimum, which would
    * differ between independently-written tables). Degenerate intervals
    * (`start >= stop`, the empty set) get no bins and drop out, matching the
    * join operators. */
  def writeBinnedTable(df: DataFrame, tableName: String, spancol: String,
      binWidth: Long, nBuckets: Int, mode: String = "overwrite"): Unit = {
    require(binWidth > 0 && nBuckets > 0, "binWidth and nBuckets must be positive")
    ManagedTables.clearOrphanedLocation(df.sparkSession, tableName)
    val bins = expr(
      s"case when ($spancol.start) < ($spancol.stop) " +
        s"then sequence(${floorDivSql(s"$spancol.start", binWidth)}, " +
        s"${floorDivSql(s"$spancol.stop - 1", binWidth)}) " +
        "else cast(array() as array<bigint>) end")
    df.withColumn("__bin", explode(bins))
      .write.format("parquet")
      .bucketBy(nBuckets, "__bin").sortBy("__bin")
      .mode(mode).saveAsTable(tableName)
  }

  /** Join two pre-binned tables written with the SAME `binWidth`/`nBuckets`:
    * bin equality + overlap residual + first-overlap-bin dedup (each pair
    * survives only in the bin containing `greatest(a.start, b.start)`, so no
    * distinct pass). Non-span column names must not collide across the two
    * tables. Output mirrors `intervalJoin`'s default contract: a's span as
    * `<spancolA>_left`, b's as `<spancolB>_right`, the intersection interval
    * under a's span name, payload columns unchanged. */
  def joinBinnedTables(spark: SparkSession, tableA: String, tableB: String,
      spancolA: String, spancolB: String, binWidth: Long): DataFrame = {
    val a = spark.table(tableA)
    val b = spark.table(tableB)
    // uniqueness over the FULL output name set — a payload column named like
    // the other table's span (or like a suffixed span) would silently
    // duplicate an output name and break later column references
    val outNames = a.columns.filterNot(c => c == "__bin" || c == spancolA) ++
      Seq(s"${spancolA}_left") ++
      b.columns.filterNot(c => c == "__bin" || c == spancolB) ++
      Seq(s"${spancolB}_right", spancolA)
    val dups = outNames.groupBy(identity).collect { case (n, g) if g.length > 1 => n }
    require(dups.isEmpty,
      s"ambiguous output columns: ${dups.mkString(", ")} — rename the clashing payload columns")
    val sA = s"__a.$spancolA"
    val sB = s"__b.$spancolB"
    val cond = col("__a.__bin") === col("__b.__bin") &&
      col(s"$sA.start") < col(s"$sB.stop") && col(s"$sB.start") < col(s"$sA.stop") &&
      col("__a.__bin") === expr(floorDivSql(s"greatest($sA.start, $sB.start)", binWidth))
    val aPayload = a.columns.filterNot(c => c == "__bin" || c == spancolA)
    val bPayload = b.columns.filterNot(c => c == "__bin" || c == spancolB)
    a.as("__a").join(b.as("__b"), cond, "inner")
      .select(
        aPayload.map(c => col(s"__a.$c")) ++
          Seq(col(sA).as(s"${spancolA}_left")) ++
          bPayload.map(c => col(s"__b.$c")) ++
          Seq(col(sB).as(s"${spancolB}_right")) :+
          IntervalCols.intersection(col(sA), col(sB)).as(spancolA): _*)
  }

  private def floorDivSql(xSql: String, w: Long): String =
    s"((($xSql) - pmod(($xSql), ${w}L)) div ${w}L)"

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
