package graft.operators

import scala.collection.mutable
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.intervals.IntervalCols._

/** Interval overlap join (reference I1–I3, `src/DataFrameIntervals.jl:97-180`):
  * one output row per pair (l, r) whose half-open intervals overlap, plus an
  * appended intersection column named after the left frame's `on` column.
  *
  * ## Physical strategies (SURVEY §4.3)
  *
  * `l.start < r.stop AND r.start < l.stop` has no equi-key, so stock Spark
  * plans it as BroadcastNestedLoopJoin (fine when one side is small — e.g. a
  * `quantileWindows` frame) or a cartesian product (fatal for big×big).
  *
  *  - [[Strategy.Range]] — emit the raw theta join and let Catalyst pick
  *    (auto-broadcasts the small side). Correct for all inputs.
  *  - [[Strategy.Binned]] — the scale path: each interval explodes to the
  *    fixed-width time bins it overlaps, the join becomes a shuffled
  *    **equi-join on bin** with the overlap predicate as residual, and each
  *    matching pair is kept exactly once (only in the bin containing
  *    `greatest(l.start, r.start)` — no distinct needed). This is the classic
  *    interval-binning MapReduce pattern; it turns an O(n·m) nested loop into
  *    a sort-merge join that partitions across a cluster.
  *  - [[Strategy.Auto]] — Range when either side's Catalyst size estimate is
  *    within the broadcast threshold, else Binned (inner joins).
  *
  * Bin width is chosen from one cheap stats pass over both `on` columns
  * (column-pruned scan): wide enough that no interval explodes to more than
  * `maxBinsPerRow` bins and the total bin count stays near `targetBins`.
  * Pass `binWidth` explicitly to skip the stats pass (recommended in
  * production pipelines where the time scale is known).
  *
  * ## Semantics carried over from the reference (SURVEY §2.1)
  *
  *  - `keepleft`/`keepright` flags → left/right/full outer joins; the other
  *    side's columns and the intersection column become NULL
  *    (`src/DataFrameIntervals.jl:126-128,163-173`). Unlike the reference,
  *    unmatched rows are kept even when the opposite side is empty — true
  *    outer semantics (documented divergence; the reference silently drops
  *    them, quirk at `:144-145,158`).
  *  - `renamecols`/`renameon` column renaming, clash guard, `makeunique`
  *    (`src/DataFrameIntervals.jl:67-95,113-124`).
  *  - NULL `on` values rejected with the reference's error message — but as a
  *    plan-time `raise_error` guard rather than an eager scan (`:136-141`).
  *  - Output column order: left columns, right columns, intersection last
  *    (`:175-179`). Row order is NOT preserved (distributed execution);
  *    compare order-insensitively.
  */
object IntervalJoin {

  sealed trait Strategy
  object Strategy {
    case object Auto   extends Strategy
    case object Range  extends Strategy
    case object Binned extends Strategy
  }

  /** Reference-style suffix renaming (`renamecols = "_l" => "_r"`). */
  def suffixes(l: String, r: String): (String => String, String => String) =
    (_ + l, _ + r)

  final case class Options(
      renamecols: (String => String, String => String) = (identity, identity),
      renameon: (String => String, String => String) = (_ + "_left", _ + "_right"),
      makeunique: Boolean = false,
      keepleft: Boolean = false,
      keepright: Boolean = false,
      strategy: Strategy = Strategy.Auto,
      binWidth: Option[Long] = None,
      targetBins: Long = 1L << 20,
      maxBinsPerRow: Long = 1024L,
      checkMissing: Boolean = true)

  def intervalJoin(left: DataFrame, right: DataFrame, on: String): DataFrame =
    intervalJoin(left, right, on -> on, Options())

  def intervalJoin(left: DataFrame, right: DataFrame, on: String, opts: Options): DataFrame =
    intervalJoin(left, right, on -> on, opts)

  def intervalJoin(left: DataFrame, right: DataFrame, on: (String, String)): DataFrame =
    intervalJoin(left, right, on, Options())

  def intervalJoin(left: DataFrame, right: DataFrame, on: (String, String), opts: Options): DataFrame = {
    val (lOnName, rOnName) = on
    require(left.columns.contains(lOnName), s"left frame has no column `$lOnName`")
    require(right.columns.contains(rOnName), s"right frame has no column `$rOnName`")
    checkOnColumn(left, lOnName, "left")
    checkOnColumn(right, rOnName, "right")

    // Output intersection column keeps the LEFT frame's `on` name (ref :76).
    val joinedOn = lOnName
    val lOnFinal = opts.renameon._1(lOnName)
    val rOnFinal = opts.renameon._2(rOnName)
    if (lOnFinal == joinedOn)
      throw new IllegalArgumentException(
        s"Interval join failed: left dataframe's `on` column has the final name `$lOnFinal` " +
          s"which clashes with the name of the joined output column `$joinedOn`; " +
          "pass a different `renameon`.")
    if (rOnFinal == joinedOn)
      throw new IllegalArgumentException(
        s"Interval join failed: right dataframe's `on` column has the final name `$rOnFinal` " +
          s"which clashes with the name of the joined output column `$joinedOn`; " +
          "pass a different `renameon`.")

    // Final output names in reference order: left columns, right columns.
    val lFinal = left.columns.map(c => if (c == lOnName) lOnFinal else opts.renamecols._1(c))
    val rFinal = right.columns.map(c => if (c == rOnName) rOnFinal else opts.renamecols._2(c))
    val finalNames = makeUnique(lFinal.toIndexedSeq ++ rFinal.toIndexedSeq, opts.makeunique)
    if (finalNames.contains(joinedOn))
      throw new IllegalArgumentException(
        s"Interval join failed: output column `$joinedOn` (the joined interval) clashes with " +
          "a renamed input column; rename the clashing column.")

    // Rename ALL columns to positional temp names before the join — kills
    // self-join ambiguity and duplicate-name issues in one move; the final
    // select restores the reference's naming contract.
    val lTmp = left.columns.indices.map(i => s"__l$i")
    val rTmp = right.columns.indices.map(i => s"__r$i")
    val lOnT = s"__l${left.columns.indexOf(lOnName)}"
    val rOnT = s"__r${right.columns.indexOf(rOnName)}"
    def project(df: DataFrame, tmp: Seq[String], onName: String, onT: String, side: String) =
      df.select(df.columns.zip(tmp).map { case (c, t) =>
        if (t == onT) {
          val norm = if (opts.checkMissing) rejectNull(col(c), side) else normalize(col(c))
          norm.as(t)
        } else col(c).as(t)
      }: _*)
    val l2 = project(left, lTmp, lOnName, lOnT, "left")
    val r2 = project(right, rTmp, rOnName, rOnT, "right")

    val joinType = (opts.keepleft, opts.keepright) match {
      case (false, false) => "inner"
      case (true, false)  => "left_outer"
      case (false, true)  => "right_outer"
      case (true, true)   => "full_outer"
    }

    val strategy = opts.strategy match {
      case Strategy.Auto =>
        val thresh = left.sparkSession.conf
          .get("spark.sql.autoBroadcastJoinThreshold", "10485760").replace("b", "").toLong
        val lSize = l2.queryExecution.optimizedPlan.stats.sizeInBytes
        val rSize = r2.queryExecution.optimizedPlan.stats.sizeInBytes
        if (thresh > 0 && (lSize <= thresh || rSize <= thresh)) Strategy.Range
        else Strategy.Binned
      case s => s
    }

    val joined = strategy match {
      case Strategy.Binned if joinType == "inner" =>
        binnedInner(l2, r2, lOnT, rOnT, opts)
      case Strategy.Binned =>
        binnedOuter(l2, r2, lOnT, rOnT, opts)
      case _ =>
        // Theta join; Catalyst broadcasts the small side (BNLJ) — right for
        // the reference's canonical small-window workloads.
        l2.join(r2, overlaps(col(lOnT), col(rOnT)), joinType)
    }

    val outCols = (lTmp ++ rTmp).zip(finalNames).map { case (t, f) => col(t).as(f) } :+
      intersection(col(lOnT), col(rOnT)).as(joinedOn)
    joined.select(outCols: _*)
  }

  /** Binned equi-join on overlapping fixed-width time buckets. See scaladoc. */
  private def binnedInner(l2: DataFrame, r2: DataFrame, lOnT: String, rOnT: String,
      opts: Options): DataFrame = {
    val stats = l2.select(start(col(lOnT)).as("s"), stop(col(lOnT)).as("e"))
      .unionAll(r2.select(start(col(rOnT)).as("s"), stop(col(rOnT)).as("e")))
      .agg(min("s"), max("e"), max(col("e") - col("s")),
        avg(col("e") - col("s"))).head()
    if (stats.isNullAt(0)) {
      // one side empty — a plain join is free and keeps the schema exact
      return l2.join(r2, overlaps(col(lOnT), col(rOnT)), "inner")
    }
    val lo = stats.getLong(0)
    val hi = stats.getLong(1)
    val maxLen = math.max(stats.getLong(2), 1L)
    val avgLen = math.max(math.ceil(stats.getDouble(3)).toLong, 1L)
    val span = math.max(hi - lo, 1L)
    // Bin width ~ the average interval length: each interval then explodes
    // to ~2 bins, so candidate work per bin stays near-linear in the output
    // (w = maxLen/64 was measured 17x slower at sf0.1 — 33x row replication
    // makes per-bin work quadratic). Floors: pathological long intervals may
    // not explode past maxBinsPerRow copies, and the total bin count stays
    // within targetBins so per-bin membership is never too fine-grained.
    val w = opts.binWidth.getOrElse {
      Seq(avgLen, ceilDiv(maxLen, opts.maxBinsPerRow), ceilDiv(span, opts.targetBins), 1L).max
    }
    // bin(x) = (x - lo) div w ; offsets are non-negative so `div` == floor.
    // Exact 64-bit integer division (SQL `div`), never through Double —
    // epoch-ns magnitudes (~1.7e18) exceed Double's 53-bit mantissa.
    def binOf(xSql: String) = s"(($xSql) - ${lo}L) div ${w}L"
    def withBins(df: DataFrame, onT: String, binCol: String) =
      df.withColumn(binCol,
        expr(s"explode(sequence(${binOf(s"$onT.start")}, ${binOf(s"$onT.stop - 1")}))"))
    val lB = withBins(l2, lOnT, "__lbin")
    val rB = withBins(r2, rOnT, "__rbin")
    // Keep each matching pair only in the bin holding greatest(l.start,
    // r.start): dedup folded into the join residual, no `distinct` shuffle.
    val cond = col("__lbin") === col("__rbin") &&
      overlaps(col(lOnT), col(rOnT)) &&
      col("__lbin") === expr(binOf(s"greatest($lOnT.start, $rOnT.start)"))
    lB.join(rB, cond, "inner").drop("__lbin", "__rbin")
  }

  /** Outer variants at scale: binned inner join + anti-join complements.
    * Row identity comes from `monotonically_increasing_id` stamped BEFORE
    * the bin explode — stable for deterministic sources (partition id +
    * in-partition index), and both the matched set and the complement
    * derive from the same stamped plan node. All shuffles are equi-joins
    * (bins, then 8-byte ids) — no nested loop anywhere. */
  private def binnedOuter(l2: DataFrame, r2: DataFrame, lOnT: String, rOnT: String,
      opts: Options): DataFrame = {
    val lId = l2.withColumn("__lid", monotonically_increasing_id())
    val rId = r2.withColumn("__rid", monotonically_increasing_id())
    val inner = binnedInner(lId, rId, lOnT, rOnT, opts)
    val nullRight = r2.columns.map(c => lit(null).cast(r2.schema(c).dataType).as(c))
    val nullLeft = l2.columns.map(c => lit(null).cast(l2.schema(c).dataType).as(c))
    val lCols = l2.columns.map(col)
    val rCols = r2.columns.map(col)
    var out = inner.select(lCols ++ rCols: _*)
    if (opts.keepleft) {
      val unmatched = lId.join(inner.select("__lid").distinct(), Seq("__lid"), "left_anti")
      out = out.unionAll(unmatched.select(lCols ++ nullRight: _*))
    }
    if (opts.keepright) {
      val unmatched = rId.join(inner.select("__rid").distinct(), Seq("__rid"), "left_anti")
      out = out.unionAll(unmatched.select(nullLeft ++ rCols: _*))
    }
    out
  }

  private def ceilDiv(a: Long, b: Long): Long = (a + b - 1) / b

  /** Plan-time schema validation, mirroring the reference's eager adapter
    * dispatch errors (SURVEY §1.3): the `on` column must be a struct
    * carrying `start` and `stop` fields (either order). */
  private def checkOnColumn(df: DataFrame, name: String, side: String): Unit =
    df.schema(name).dataType match {
      case s: org.apache.spark.sql.types.StructType
        if s.fieldNames.contains("start") && s.fieldNames.contains("stop") => ()
      case other => throw new IllegalArgumentException(
        s"the $side frame's `on` column `$name` must be a struct<start,stop> interval " +
          s"(use graft.intervals.IntervalCols.interval/intervalFromTimestamps to build one); " +
          s"got ${other.simpleString}")
    }

  /** DataFrames.jl-style `makeunique`: duplicate names get `_1`, `_2`, ...
    * suffixes; without the flag duplicates are an error
    * (`src/DataFrameIntervals.jl:113-115`, `test/runtests.jl:70-74`). */
  private[graft] def makeUnique(names: Seq[String], allow: Boolean): Seq[String] = {
    val seen = mutable.HashSet.empty[String]
    names.map { n =>
      if (seen.add(n)) n
      else if (!allow)
        throw new IllegalArgumentException(
          s"Duplicate variable names: `$n`. Pass makeunique=true to make them unique using a suffix automatically.")
      else {
        var i = 1
        var cand = s"${n}_$i"
        while (!seen.add(cand)) { i += 1; cand = s"${n}_$i" }
        cand
      }
    }
  }
}
