package graft.operators

import scala.collection.mutable
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
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
    /** v3: range-partitioned per-partition plane sweep ([[SweepJoin]]) —
      * quantile-balanced partitions, stop-ordered active lists, streamed
      * output. Inner joins only; outer variants fall back to Binned. */
    case object Sweep  extends Strategy
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
      checkMissing: Boolean = true,
      /** Auto picks the broadcast range join only when the smaller side's
        * estimated ROW count stays under this. Broadcast-small-in-bytes is
        * the right gate for a hash join but the wrong one for a theta join:
        * a BNLJ evaluates smallRows × bigRows predicate pairs, so a 10 MB /
        * 100 k-row side against a same-sized stream side is 10^10 pair
        * evaluations — minutes, while the binned/sweep paths do it in
        * seconds. A genuinely small window frame (10^2-10^4 rows) against
        * an arbitrarily big side remains the broadcast shape: the big side
        * never shuffles, which is the correct 100 TB trade. */
      maxRangeRows: Long = 10000L,
      /** Sweep fat-tail guard: intervals LONGER than this route to
        * broadcast side-joins instead of replicating across every range
        * partition they span (SweepJoin's long/short split). None = auto:
        * long means "would replicate > sweepMaxReplication range
        * partitions" (length > that many typical range widths); when no
        * sampled row exceeds the bound — every short-span fixture — the
        * split never engages and the plan is the pure sweep, unchanged. */
      sweepLongThreshold: Option[Long] = None,
      sweepMaxReplication: Int = 16,
      /** If the long mass exceeds this row count, broadcasting it would be
        * worse than replicating it — fall back to the unsplit sweep. The
        * long-mass branches are broadcast nested-loop joins with a pure
        * range predicate, so this cap bounds COMPUTE (long rows × stream
        * rows predicate evaluations), not just broadcast memory: at the
        * old 2 M default the BNLJ itself was already the catastrophic
        * regime long before the memory bound engaged. 50 k longs against
        * even a 10 M-row stream side is ~5·10^11 cheap comparisons spread
        * over the cluster — near the practical ceiling. */
      sweepMaxBroadcastRows: Long = 50000L)

  def intervalJoin(left: DataFrame, right: DataFrame, on: String): DataFrame =
    intervalJoin(left, right, on -> on, Options())

  def intervalJoin(left: DataFrame, right: DataFrame, on: String, opts: Options): DataFrame =
    intervalJoin(left, right, on -> on, opts)

  def intervalJoin(left: DataFrame, right: DataFrame, on: (String, String)): DataFrame =
    intervalJoin(left, right, on, Options())

  /** Point-in-interval ("stab") join: one output row per (point, interval)
    * pair with the point inside the half-open interval. Points lift to
    * degenerate one-tick spans — in an integral tick space
    * `t ∈ [s, e)` ⇔ `[t, t+1) overlaps [s, e)` exactly — and run through
    * [[intervalJoin]], so every physical strategy (broadcast range, binned
    * equi-join, sweep) applies unchanged; a point explodes to exactly one
    * bin on the binned path. Output: the point frame's columns then the
    * interval frame's columns under the usual rename contract, with the
    * synthetic span and the (redundant, point-valued) intersection dropped.
    * Timestamp points pair with timestamp-struct intervals on the µs tick
    * space the join already uses; floating endpoints have no tick below
    * every other value, so they are rejected — quantize first. */
  def stabJoin(points: DataFrame, intervals: DataFrame, on: (String, String),
      opts: Options = Options()): DataFrame = {
    import org.apache.spark.sql.types._
    val (ptName, ivName) = on
    require(points.columns.contains(ptName), s"points frame has no column `$ptName`")
    val tmp = "__stab_span"
    require(!points.columns.contains(tmp), s"points frame may not contain `$tmp`")
    val lifted = points.schema(ptName).dataType match {
      case ByteType | ShortType | IntegerType | LongType =>
        // t = Long.MaxValue has no successor tick: t+1 wraps to a reversed
        // span the strategies silently drop — raise instead of losing the
        // point (smaller integral types can never reach the edge)
        val pt = col(ptName).cast("long")
        val next = when(pt === lit(Long.MaxValue), raise_error(concat(
          lit("stab_join: point column `" + ptName + "` holds 9223372036854775807 " +
            "(Long.MaxValue), which cannot lift to a [t, t+1) span — " +
            "exclude or re-encode that tick"))).cast("long"))
          .otherwise(pt + lit(1L))
        points.withColumn(tmp, interval(pt, next))
      case TimestampType | TimestampNTZType =>
        points.withColumn(tmp, struct(col(ptName).as("start"),
          (col(ptName) + expr("INTERVAL 1 MICROSECOND")).as("stop")))
      case other => throw new IllegalArgumentException(
        s"stab_join requires an integral or timestamp point column; `$ptName` is " +
          s"${other.simpleString} — quantize floating points to integer ticks first.")
    }
    // Auto resolves to Binned here, not the general join's broadcast-range
    // pick: a broadcast theta join scans EVERY interval per point (points ×
    // intervals predicate evals — quadratic even when the interval side
    // fits in a broadcast), while the binned equi-join hashes each point
    // into exactly one bin for near-constant per-point work. The general
    // join's trade (small side broadcast, big side unshuffled) loses here
    // because the probe is linear, not hashed.
    val stabOpts =
      if (opts.strategy == Strategy.Auto) opts.copy(strategy = Strategy.Binned)
      else opts
    val j = intervalJoin(lifted, intervals, tmp -> ivName, stabOpts)
    // left `on` keeps its renamed slot and the intersection takes the left
    // name itself (the reference's contract) — both are the degenerate span
    j.drop(opts.renameon._1(tmp)).drop(tmp)
  }

  def intervalJoin(left: DataFrame, right: DataFrame, on: (String, String), opts: Options): DataFrame = {
    val (lOnName, rOnName) = on
    require(left.columns.contains(lOnName), s"left frame has no column `$lOnName`")
    require(right.columns.contains(rOnName), s"right frame has no column `$rOnName`")
    checkOnColumn(left, lOnName, "left")
    checkOnColumn(right, rOnName, "right")

    // Bounded intervals (struct<start,stop,lclosed,rclosed> — the
    // reference's generic `Interval{T,L,R}`, src/DataFrameIntervals.jl:31-35,
    // closed-closed example README.md:29) join on the bound-sensitive
    // predicates: range/theta with a broadcast-small side, or a binned
    // equi-join (inclusive-stop bins, bound-sensitive residual) for big-big
    // inner joins with integral endpoints. A plain half-open side joining a
    // bounded side is lifted to Closed-Open.
    if (isBounded(left, lOnName) || isBounded(right, rOnName))
      return boundedJoin(left, right, on, opts)

    // Timestamp-struct intervals are supported natively: converted to exact
    // long-µs ticks for the join, converted back on output (the reference's
    // `backto` contract — results keep the input representation). Mixed
    // long/timestamp sides are ambiguous (whose unit is the long?) → error.
    val lTsType = timestampEndpointType(left, lOnName)
    val rTsType = timestampEndpointType(right, rOnName)
    if (lTsType != rTsType)
      throw new IllegalArgumentException(
        "interval_join requires both `on` columns in the same representation: " +
          s"left `$lOnName` is ${lTsType.map(_.simpleString).getOrElse("long")}-based but right " +
          s"`$rOnName` is ${rTsType.map(_.simpleString).getOrElse("long")}-based; convert one side " +
          "(IntervalCols.microsFromTimestampStruct / timestampStructFromMicros).")
    val lTs = lTsType.isDefined
    val ntz = lTsType.contains(org.apache.spark.sql.types.TimestampNTZType)
    // non-timestamp endpoints: integral types widen to long ticks internally
    // and are restored on output (`backto`); floating endpoints (reference
    // generic ordered `T`, src/DataFrameIntervals.jl:31) widen to double and
    // are range-join-only — floats have no exact tick space for the
    // binned/sweep integer math
    val (lIntType, rIntType) =
      if (lTs) (None, None)
      else (Some(endpointType(left, lOnName, "left")),
        Some(endpointType(right, rOnName, "right")))
    val isFloat = lIntType.exists(isFloating) || rIntType.exists(isFloating)
    if (isFloat && !lIntType.forall(isFloating))
      throw new IllegalArgumentException(
        "interval_join cannot mix floating and integral interval endpoints across sides " +
          s"(left `$lOnName` is ${lIntType.get.simpleString}, right `$rOnName` is " +
          s"${rIntType.get.simpleString}); cast one side explicitly.")
    if (isFloat && !rIntType.forall(isFloating))
      throw new IllegalArgumentException(
        "interval_join cannot mix floating and integral interval endpoints across sides " +
          s"(left `$lOnName` is ${lIntType.get.simpleString}, right `$rOnName` is " +
          s"${rIntType.get.simpleString}); cast one side explicitly.")
    if (isFloat && (opts.strategy == Strategy.Binned || opts.strategy == Strategy.Sweep))
      throw new IllegalArgumentException(
        s"the ${opts.strategy} strategy requires integral or timestamp interval endpoints " +
          "(exact tick space); floating endpoints run on Strategy.Range — quantize the " +
          "endpoints to integer ticks to use the binned/sweep scale paths.")

    // Output intersection column keeps the LEFT frame's `on` name (ref :76).
    val joinedOn = lOnName
    val finalNames = finalNamesFor(left, right, on, opts)

    // Rename ALL columns to positional temp names before the join — kills
    // self-join ambiguity and duplicate-name issues in one move; the final
    // select restores the reference's naming contract.
    val lTmp = left.columns.indices.map(i => s"__l$i")
    val rTmp = right.columns.indices.map(i => s"__r$i")
    val lOnT = s"__l${left.columns.indexOf(lOnName)}"
    val rOnT = s"__r${right.columns.indexOf(rOnName)}"
    def project(df: DataFrame, tmp: Seq[String], onName: String, onT: String,
        side: String, intType: Option[org.apache.spark.sql.types.DataType]) =
      df.select(df.columns.zip(tmp).map { case (c, t) =>
        if (t == onT) {
          val norm = if (opts.checkMissing) rejectNull(col(c), side) else normalize(col(c))
          val internal = internalTypeOf(intType)
          val ticks =
            if (lTs) microsFromTimestampStruct(norm, ntz)
            else if (internal.isDefined)
              when(norm.isNull, lit(null)).otherwise(
                interval(norm.getField("start").cast(internal.get),
                  norm.getField("stop").cast(internal.get)))
            else norm
          ticks.as(t)
        } else col(c).as(t)
      }: _*)
    val l2 = project(left, lTmp, lOnName, lOnT, "left", lIntType)
    val r2 = project(right, rTmp, rOnName, rOnT, "right", rIntType)

    val joinType = (opts.keepleft, opts.keepright) match {
      case (false, false) => "inner"
      case (true, false)  => "left_outer"
      case (false, true)  => "right_outer"
      case (true, true)   => "full_outer"
    }

    val strategy = opts.strategy match {
      case Strategy.Auto if isFloat => Strategy.Range // no tick space to bin
      case Strategy.Auto =>
        if (rangeJoinViable(l2, r2, opts)) Strategy.Range
        // big-big: the per-partition sweep beats the binned equi-join on
        // inner joins (measured 1.4x at 29 M pairs, 2.8x at 500 M — and the
        // gap WIDENS with scale); outer variants run on the binned path
        else if (joinType == "inner") Strategy.Sweep
        else Strategy.Binned
      case s => s
    }

    val joined = strategy match {
      case Strategy.Binned if joinType == "inner" =>
        binnedInner(l2, r2, lOnT, rOnT, opts)
      case Strategy.Sweep if joinType == "inner" =>
        SweepJoin.sweepInner(l2, r2, lOnT, rOnT, opts)
      case Strategy.Binned | Strategy.Sweep =>
        binnedOuter(l2, r2, lOnT, rOnT, opts)
      case _ =>
        // Theta join; Catalyst broadcasts the small side (BNLJ) — right for
        // the reference's canonical small-window workloads.
        l2.join(r2, overlaps(col(lOnT), col(rOnT)), joinType)
    }

    def backto(c: Column, intType: Option[org.apache.spark.sql.types.DataType]): Column =
      if (lTs) timestampStructFromMicros(c, ntz)
      else intType match {
        case Some(dt) if dt != org.apache.spark.sql.types.LongType =>
          when(c.isNull, lit(null)).otherwise(
            struct(c.getField("start").cast(dt).as("start"),
              c.getField("stop").cast(dt).as("stop")))
        case _ => c
      }
    // the intersection mixes both sides' values -> the wider integral type
    def width(dt: org.apache.spark.sql.types.DataType): Int = dt.defaultSize
    val isectType = for (a <- lIntType; b <- rIntType)
      yield if (width(a) >= width(b)) a else b
    val outCols = (lTmp ++ rTmp).zip(finalNames).map { case (t, f) =>
      if (t == lOnT) backto(col(t), lIntType).as(f)
      else if (t == rOnT) backto(col(t), rIntType).as(f)
      else col(t).as(f)
    } :+ backto(intersection(col(lOnT), col(rOnT)), isectType).as(joinedOn)
    joined.select(outCols: _*)
  }

  /** Shared setup for the binned strategies: one cheap stats pass picks the
    * bin width, both sides explode to the bins they overlap, and the returned
    * condition is the bin equi-key + overlap residual + first-overlap-bin
    * dedup. Returns None when there are no intervals at all (both sides
    * empty) — callers fall back to a plain theta join, which is free there.
    *
    * `outer = true` switches to `explode_outer` (rows with zero bins survive
    * with a NULL bin so outer variants can keep them) and stamps each side's
    * own first bin (`__lbin0`/`__rbin0`) for null-extension dedup. */
  private def binPlan(l2: DataFrame, r2: DataFrame, lOnT: String, rOnT: String,
      opts: Options, outer: Boolean): Option[(DataFrame, DataFrame, Column)] = {
    val stats = l2.select(start(col(lOnT)).as("s"), stop(col(lOnT)).as("e"))
      .unionAll(r2.select(start(col(rOnT)).as("s"), stop(col(rOnT)).as("e")))
      .agg(min("s"), max("e"), max(col("e") - col("s")),
        avg(col("e") - col("s"))).head()
    if (stats.isNullAt(0)) return None
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
    // Reversed/empty intervals (start >= stop) overlap nothing: give them an
    // empty bin array instead of letting `sequence` count DOWN and explode
    // one corrupt row into up to targetBins rows.
    def binsOf(onT: String) = expr(
      s"case when ($onT.start) < ($onT.stop) " +
        s"then sequence(${binOf(s"$onT.start")}, ${binOf(s"$onT.stop - 1")}) " +
        "else cast(array() as array<bigint>) end")
    def withBins(df: DataFrame, onT: String, binCol: String, bin0: String) = {
      val exploded = df.withColumn(binCol,
        if (outer) explode_outer(binsOf(onT)) else explode(binsOf(onT)))
      if (outer) exploded.withColumn(bin0, expr(binOf(s"$onT.start"))) else exploded
    }
    val lB = withBins(l2, lOnT, "__lbin", "__lbin0")
    val rB = withBins(r2, rOnT, "__rbin", "__rbin0")
    // Keep each matching pair only in the bin holding greatest(l.start,
    // r.start): dedup folded into the join residual, no `distinct` shuffle.
    // Raw overlap predicate (no degenerate-interval conjuncts): only rows
    // with start < stop receive bins at all, so the extra checks that
    // `overlaps` needs on the Range path are already guaranteed here —
    // two fewer comparisons per candidate pair in the hot loop.
    val cond = col("__lbin") === col("__rbin") &&
      start(col(lOnT)) < stop(col(rOnT)) && start(col(rOnT)) < stop(col(lOnT)) &&
      col("__lbin") === expr(binOf(s"greatest($lOnT.start, $rOnT.start)"))
    Some((lB, rB, cond))
  }

  /** Binned equi-join on overlapping fixed-width time buckets. See scaladoc. */
  private def binnedInner(l2: DataFrame, r2: DataFrame, lOnT: String, rOnT: String,
      opts: Options): DataFrame =
    binPlan(l2, r2, lOnT, rOnT, opts, outer = false) match {
      case None             => l2.join(r2, overlaps(col(lOnT), col(rOnT)), "inner")
      case Some((lB, rB, c)) => lB.join(rB, c, "inner").drop("__lbin", "__rbin")
    }

  /** Outer variants at scale: ONE binned outer join, then window-computed
    * matched flags decide which null-extended rows survive.
    *
    * Row identity comes from `monotonically_increasing_id` stamped before the
    * bin explode. The id column feeds only window partition keys inside this
    * single linear plan — it appears exactly ONCE in the DAG, so the two-
    * subtree id-drift hazard (re-evaluating a non-deterministic id under a
    * complement anti-join) cannot arise. An original row matched in any bin
    * has `max(match flag) = 1` across its exploded copies; unmatched rows
    * keep exactly one null-extended copy (the one from the interval's first
    * bin, or the NULL bin of a zero-bin row). NULL-side ids in the window
    * keys are replaced by the other side's id negated, so unmatched rows
    * spread across partitions instead of piling into one NULL-key partition.
    * All shuffles are equi-partitioned (bins, then 8-byte ids) — no nested
    * loop anywhere. */
  private def binnedOuter(l2: DataFrame, r2: DataFrame, lOnT: String, rOnT: String,
      opts: Options): DataFrame = {
    val joinType = (opts.keepleft, opts.keepright) match {
      case (true, true)  => "full_outer"
      case (true, false) => "left_outer"
      case _             => "right_outer"
    }
    val lId = l2.withColumn("__lid", monotonically_increasing_id())
    val rId = r2.withColumn("__rid", monotonically_increasing_id())
    binPlan(lId, rId, lOnT, rOnT, opts, outer = true) match {
      case None =>
        l2.join(r2, overlaps(col(lOnT), col(rOnT)), joinType)
      case Some((lB, rB, cond)) =>
        outerOverBins(lB, rB, cond, joinType, l2.columns ++ r2.columns, opts)
    }
  }

  /** The outer machinery shared by the tick and bounded binned paths: ONE
    * binned outer join, window-computed matched flags, null-extension dedup
    * by first bin (see [[binnedOuter]] scaladoc for the design notes).
    * Expects `__lid`/`__rid` stamped before the bin explode and
    * `__lbin`/`__lbin0` (resp. right) from the bin plan. */
  private def outerOverBins(lB: DataFrame, rB: DataFrame, cond: Column,
      joinType: String, outColumns: Seq[String], opts: Options): DataFrame = {
    var flagged = lB.join(rB, cond, joinType)
    if (opts.keepleft)
      flagged = flagged.withColumn("__lmatch",
        max(when(col("__rid").isNotNull, 1).otherwise(0)).over(
          Window.partitionBy(coalesce(col("__lid"), lit(-1L) - col("__rid")))))
    if (opts.keepright)
      flagged = flagged.withColumn("__rmatch",
        max(when(col("__lid").isNotNull, 1).otherwise(0)).over(
          Window.partitionBy(coalesce(col("__rid"), lit(-1L) - col("__lid")))))
    val matchedPair = col("__lid").isNotNull && col("__rid").isNotNull
    val keepL =
      if (opts.keepleft)
        col("__rid").isNull && col("__lid").isNotNull && col("__lmatch") === 0 &&
          (col("__lbin") === col("__lbin0") || col("__lbin").isNull)
      else lit(false)
    val keepR =
      if (opts.keepright)
        col("__lid").isNull && col("__rid").isNotNull && col("__rmatch") === 0 &&
          (col("__rbin") === col("__rbin0") || col("__rbin").isNull)
      else lit(false)
    flagged.where(matchedPair || keepL || keepR)
      .select(outColumns.map(col): _*)
  }

  private def ceilDiv(a: Long, b: Long): Long = (a + b - 1) / b

  /** Auto's gate for the broadcast range/theta join: one side must be
    * broadcastable in BYTES (Spark's own threshold — handles byte-string
    * confs) AND small in estimated ROWS (`Options.maxRangeRows`) — a BNLJ's
    * cost is the pair-count product, so bytes alone under-gates it (a
    * measured 50 k × 50 k self-join slipped under a 10 MB threshold and ran
    * a 2.5 G-pair nested loop ~9x slower than the binned path). Row counts
    * use Catalyst's estimate when known (generated ranges, CBO) and a
    * conservative sizeInBytes/64 otherwise — compressed parquet averages
    * well over 64 B/row uncompressed, so the estimate errs toward MORE rows,
    * i.e. toward the scale paths. */
  private def rangeJoinViable(l2: DataFrame, r2: DataFrame, opts: Options): Boolean = {
    val thresh = l2.sparkSession.sessionState.conf.autoBroadcastJoinThreshold
    if (thresh <= 0) return false
    val lStats = l2.queryExecution.optimizedPlan.stats
    val rStats = r2.queryExecution.optimizedPlan.stats
    def rows(s: org.apache.spark.sql.catalyst.plans.logical.Statistics): BigInt =
      s.rowCount.getOrElse(s.sizeInBytes / 64)
    val (smallStats, smallRows) =
      if (lStats.sizeInBytes <= rStats.sizeInBytes) (lStats, rows(lStats))
      else (rStats, rows(rStats))
    smallStats.sizeInBytes <= thresh && smallRows <= opts.maxRangeRows
  }

  /** The reference's output-naming contract, shared by the tick and bounded
    * paths: left columns then right columns, `on` columns renamed by
    * `renameon`, payload columns by `renamecols`, duplicates resolved by
    * `makeunique`, and nothing may clash with the joined output column
    * (named after the LEFT `on`, ref `src/DataFrameIntervals.jl:76,113-124`). */
  private def finalNamesFor(left: DataFrame, right: DataFrame,
      on: (String, String), opts: Options): Seq[String] = {
    val (lOnName, rOnName) = on
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
    val lFinal = left.columns.map(c => if (c == lOnName) lOnFinal else opts.renamecols._1(c))
    val rFinal = right.columns.map(c => if (c == rOnName) rOnFinal else opts.renamecols._2(c))
    val finalNames = makeUnique(lFinal.toIndexedSeq ++ rFinal.toIndexedSeq, opts.makeunique)
    if (finalNames.contains(joinedOn))
      throw new IllegalArgumentException(
        s"Interval join failed: output column `$joinedOn` (the joined interval) clashes with " +
          "a renamed input column; rename the clashing column.")
    finalNames
  }

  /** A bounded interval column: struct carrying start/stop plus the
    * lclosed/rclosed bound flags ([[graft.intervals.BoundedIntervals]]). */
  private def isBounded(df: DataFrame, name: String): Boolean =
    df.schema(name).dataType match {
      case s: org.apache.spark.sql.types.StructType =>
        Seq("start", "stop", "lclosed", "rclosed").forall(s.fieldNames.contains)
      case _ => false
    }

  /** Range/theta join with per-row bound semantics. No tick conversion —
    * the predicates are pure comparisons, so any atomic orderable endpoint
    * type works (ints, floats, timestamps, dates...), it only has to agree
    * across all four endpoints. The joined output column follows the
    * reference's `backto`-to-left contract: bounded (with merged flags) when
    * the LEFT side is bounded, plain start/stop when the left side is a
    * half-open struct joined against a bounded right. */
  private def boundedJoin(left: DataFrame, right: DataFrame,
      on: (String, String), opts: Options): DataFrame = {
    import graft.intervals.BoundedIntervals
    val (lOnName, rOnName) = on
    val lB = isBounded(left, lOnName)
    val rB = isBounded(right, rOnName)
    def epTypes(df: DataFrame, name: String) = {
      val s = df.schema(name).dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
      (s("start").dataType, s("stop").dataType)
    }
    val (ls, le) = epTypes(left, lOnName)
    val (rs, re) = epTypes(right, rOnName)
    if (!(ls == le && rs == re && ls == rs))
      throw new IllegalArgumentException(
        "bounded interval join requires ONE endpoint type across all four endpoints; got " +
          s"left struct<start:${ls.simpleString}, stop:${le.simpleString}>, " +
          s"right struct<start:${rs.simpleString}, stop:${re.simpleString}>")
    for ((df, name, bounded) <- Seq((left, lOnName, lB), (right, rOnName, rB)) if bounded) {
      val s = df.schema(name).dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
      val bad = Seq("lclosed", "rclosed").filter(f =>
        s(f).dataType != org.apache.spark.sql.types.BooleanType)
      if (bad.nonEmpty)
        throw new IllegalArgumentException(
          s"bounded interval column `$name`: ${bad.mkString(", ")} must be boolean")
    }

    val joinedOn = lOnName
    val finalNames = finalNamesFor(left, right, on, opts)

    // positional temp names kill self-join ambiguity, as on the tick path
    val lTmp = left.columns.indices.map(i => s"__l$i")
    val rTmp = right.columns.indices.map(i => s"__r$i")
    val lOnT = s"__l${left.columns.indexOf(lOnName)}"
    val rOnT = s"__r${right.columns.indexOf(rOnName)}"
    def reorder(c: Column, bounded: Boolean): Column =
      if (bounded)
        BoundedIntervals.bounded(c.getField("start"), c.getField("stop"),
          c.getField("lclosed"), c.getField("rclosed"))
      else normalize(c)
    def guard(c: Column, side: String, bounded: Boolean): Column =
      if (!opts.checkMissing) reorder(c, bounded)
      else when(c.isNull || c.getField("start").isNull || c.getField("stop").isNull ||
          (if (bounded) c.getField("lclosed").isNull || c.getField("rclosed").isNull
           else lit(false)),
        raise_error(lit(s"There are missing values in the $side table of `interval_join`.")))
        .otherwise(reorder(c, bounded))
    def project(df: DataFrame, tmp: Seq[String], onT: String, side: String, bounded: Boolean) =
      df.select(df.columns.zip(tmp).map { case (c, t) =>
        (if (t == onT) guard(col(c), side, bounded) else col(c)).as(t)
      }: _*)
    val l2 = project(left, lTmp, lOnT, "left", lB)
    val r2 = project(right, rTmp, rOnT, "right", rB)

    // NULL-preserving lift: a bare fromHalfOpen would wrap an outer join's
    // unmatched-side NULL as struct(NULL,NULL,true,false) — non-NULL, so it
    // would slip past intersectBounded's NULL guard and greatest/least would
    // SKIP the null endpoints, fabricating an intersection equal to the
    // matched side's own interval instead of NULL
    def lifted(c: Column, bounded: Boolean): Column =
      if (bounded) c
      else when(c.isNull, lit(null)).otherwise(BoundedIntervals.fromHalfOpen(c))
    val joinType = (opts.keepleft, opts.keepright) match {
      case (false, false) => "inner"
      case (true, false)  => "left_outer"
      case (false, true)  => "right_outer"
      case (true, true)   => "full_outer"
    }
    val overlapCond =
      BoundedIntervals.overlapsBounded(lifted(col(lOnT), lB), lifted(col(rOnT), rB))
    // Big-big bounded joins with integral endpoints get the same scale path
    // as half-open intervals: a binned equi-join (inner AND outer — the
    // outer variants reuse the tick path's window-flag machinery over the
    // bounded bin plan). Binning differs in two bound-driven details — the
    // stop bin is INCLUSIVE (a closed stop can still touch-match inside its
    // own bin) and closed-closed points [a,a] are non-empty and get their
    // one bin — and the bound-sensitive overlap runs as the residual
    // predicate. Non-integral endpoints stay on the theta join (no exact
    // tick space; Catalyst broadcasts the small side).
    val integral = Seq[org.apache.spark.sql.types.DataType](
      org.apache.spark.sql.types.ByteType, org.apache.spark.sql.types.ShortType,
      org.apache.spark.sql.types.IntegerType, org.apache.spark.sql.types.LongType
    ).contains(ls)
    def rejectStrategy(reason: String): Nothing = throw new IllegalArgumentException(
      s"the ${opts.strategy} strategy cannot run this bounded interval join ($reason); " +
        "bounded joins run on Strategy.Range, or Strategy.Binned with integral endpoints.")
    val useBinned = opts.strategy match {
      case Strategy.Sweep => rejectStrategy("the sweep assumes half-open tick intervals")
      case Strategy.Binned if !integral => rejectStrategy("no integral tick space to bin")
      case Strategy.Binned => true
      case Strategy.Auto if integral => !rangeJoinViable(l2, r2, opts)
      case _ => false
    }
    val joined =
      if (!useBinned) l2.join(r2, overlapCond, joinType)
      else if (joinType == "inner")
        boundedBinnedInner(l2, r2, lOnT, rOnT, lB, rB, opts, overlapCond)
      else
        boundedBinnedOuter(l2, r2, lOnT, rOnT, lB, rB, opts, overlapCond, joinType)

    val isectBounded =
      BoundedIntervals.intersectBounded(lifted(col(lOnT), lB), lifted(col(rOnT), rB))
    val isect =
      if (lB) isectBounded
      else when(isectBounded.isNull, lit(null)).otherwise(
        interval(isectBounded.getField("start"), isectBounded.getField("stop")))
    val outCols = (lTmp ++ rTmp).zip(finalNames).map { case (t, f) => col(t).as(f) } :+
      isect.as(joinedOn)
    joined.select(outCols: _*)
  }

  /** The bounded twin of [[binPlan]] (see the call site for the
    * bound-driven differences). `l2`/`r2` carry the projected temp columns;
    * the `on` temp columns are bounded structs after `guard`/`lifted`
    * normalization happens at the call site — here both are re-lifted
    * identically so the residual `overlapCond` (built over the same temp
    * names) applies unchanged. With `outer = true` rows with zero bins
    * survive via `explode_outer` and each side stamps its first bin, feeding
    * [[outerOverBins]] exactly like the tick path. */
  private def boundedBinPlan(l2: DataFrame, r2: DataFrame, lOnT: String,
      rOnT: String, lB: Boolean, rB: Boolean, opts: Options,
      overlapCond: Column, outer: Boolean): Option[(DataFrame, DataFrame, Column)] = {
    def sE(onT: String) = (col(s"$onT.start").cast("long"), col(s"$onT.stop").cast("long"))
    val (ls0, le0) = sE(lOnT)
    val (rs0, re0) = sE(rOnT)
    val stats = l2.select(ls0.as("s"), le0.as("e"))
      .unionAll(r2.select(rs0.as("s"), re0.as("e")))
      .agg(min("s"), max("e"), max(col("e") - col("s")), avg(col("e") - col("s"))).head()
    if (stats.isNullAt(0)) return None
    val lo = stats.getLong(0)
    val maxLen = math.max(stats.getLong(2), 1L)
    val avgLen = math.max(math.ceil(stats.getDouble(3)).toLong, 1L)
    val span = math.max(stats.getLong(1) - lo, 1L)
    val w = opts.binWidth.getOrElse {
      Seq(avgLen, ceilDiv(maxLen, opts.maxBinsPerRow), ceilDiv(span, opts.targetBins), 1L).max
    }
    def binOf(xSql: String) = s"((cast(($xSql) as bigint)) - ${lo}L) div ${w}L"
    // bounded side: non-empty per BoundedIntervals.nonEmpty ([a,a] CC is a
    // point), stop bin INCLUSIVE (a closed stop can touch-match in its own
    // bin); plain half-open side: the tick path's exclusive-stop binning
    def binsOf(onT: String, bounded: Boolean) = expr(
      if (bounded)
        s"case when ($onT.start) < ($onT.stop) " +
          s"or (($onT.start) = ($onT.stop) and ($onT.lclosed) and ($onT.rclosed)) " +
          s"then sequence(${binOf(s"$onT.start")}, ${binOf(s"$onT.stop")}) " +
          "else cast(array() as array<bigint>) end"
      else
        s"case when ($onT.start) < ($onT.stop) " +
          s"then sequence(${binOf(s"$onT.start")}, ${binOf(s"$onT.stop - 1")}) " +
          "else cast(array() as array<bigint>) end")
    def withBins(df: DataFrame, onT: String, bounded: Boolean,
        binCol: String, bin0: String) = {
      val exploded = df.withColumn(binCol,
        if (outer) explode_outer(binsOf(onT, bounded)) else explode(binsOf(onT, bounded)))
      if (outer) exploded.withColumn(bin0, expr(binOf(s"$onT.start"))) else exploded
    }
    val lBinned = withBins(l2, lOnT, lB, "__lbin", "__lbin0")
    val rBinned = withBins(r2, rOnT, rB, "__rbin", "__rbin0")
    val cond = col("__lbin") === col("__rbin") && overlapCond &&
      col("__lbin") === expr(binOf(s"greatest($lOnT.start, $rOnT.start)"))
    Some((lBinned, rBinned, cond))
  }

  /** Binned equi-join for bounded inner joins. */
  private def boundedBinnedInner(l2: DataFrame, r2: DataFrame, lOnT: String,
      rOnT: String, lB: Boolean, rB: Boolean, opts: Options,
      overlapCond: Column): DataFrame =
    boundedBinPlan(l2, r2, lOnT, rOnT, lB, rB, opts, overlapCond, outer = false) match {
      case None => l2.join(r2, overlapCond, "inner")
      case Some((lBinned, rBinned, cond)) =>
        lBinned.join(rBinned, cond, "inner").drop("__lbin", "__rbin")
    }

  /** Binned outer variants for bounded joins: the bounded bin plan feeding
    * the tick path's shared window-flag machinery — no BNLJ for big×big
    * bounded outer asks. */
  private def boundedBinnedOuter(l2: DataFrame, r2: DataFrame, lOnT: String,
      rOnT: String, lB: Boolean, rB: Boolean, opts: Options,
      overlapCond: Column, joinType: String): DataFrame = {
    val lId = l2.withColumn("__lid", monotonically_increasing_id())
    val rId = r2.withColumn("__rid", monotonically_increasing_id())
    boundedBinPlan(lId, rId, lOnT, rOnT, lB, rB, opts, overlapCond, outer = true) match {
      case None => l2.join(r2, overlapCond, joinType)
      case Some((lBinned, rBinned, cond)) =>
        outerOverBins(lBinned, rBinned, cond, joinType, l2.columns ++ r2.columns, opts)
    }
  }

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

  /** Endpoint type of a non-timestamp interval column: integral types are
    * accepted on every strategy (narrower ones widen to long ticks
    * internally and come back in their own type — `backto`); floating types
    * are accepted on the Range strategy only (widened to double internally);
    * anything else is rejected up front rather than failing inside a stats
    * pass. */
  private def endpointType(df: DataFrame, name: String, side: String)
      : org.apache.spark.sql.types.DataType = {
    import org.apache.spark.sql.types._
    val s = df.schema(name).dataType.asInstanceOf[StructType]
    val ts = Seq("start", "stop").map(f => s(f).dataType)
    ts match {
      case Seq(a, b) if a == b && Seq[DataType](ByteType, ShortType,
        IntegerType, LongType, FloatType, DoubleType).contains(a) => a
      case other => throw new IllegalArgumentException(
        s"the $side frame's `on` column `$name` must have integral, floating or " +
          s"timestamp endpoints; got " +
          s"struct<start:${other.head.simpleString}, stop:${other.last.simpleString}>")
    }
  }

  private def isFloating(dt: org.apache.spark.sql.types.DataType): Boolean = {
    import org.apache.spark.sql.types._
    dt == FloatType || dt == DoubleType
  }

  /** Internal join representation for a declared endpoint type: long ticks
    * for integral endpoints, double for floating ones; None = no conversion
    * needed. */
  private def internalTypeOf(declared: Option[org.apache.spark.sql.types.DataType])
      : Option[org.apache.spark.sql.types.DataType] = {
    import org.apache.spark.sql.types._
    declared match {
      case Some(dt) if isFloating(dt) && dt != DoubleType => Some(DoubleType)
      case Some(dt) if !isFloating(dt) && dt != LongType  => Some(LongType)
      case _ => None
    }
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
