package graft.operators

import org.apache.spark.sql.{Column, DataFrame, RelationalGroupedDataset}
import org.apache.spark.sql.functions.col

/** Fused grouped interval join + aggregate (reference I7
  * `groupby_interval_join`, `src/DataFrameIntervals.jl:241-329`) and the
  * grouping-column selector DSL (reference I8 `find_valid`, `:195-237`).
  *
  * The reference builds a lazy `GroupedIntervalJoin` so the full join is
  * never materialized before grouping. Under Spark that fusion is automatic:
  * Catalyst plans `intervalJoin(...).groupBy(...).agg(...)` as one pipelined
  * job with partial (map-side) aggregation — no intermediate materialization
  * exists to avoid. The API is kept for parity as a thin lazy wrapper; its
  * `agg` is contractually identical to
  * `combine(groupby(interval_join(left, right), groups), ...)`
  * (equivalence pinned by reference `test/runtests.jl:83-93,110-116`).
  */
object GroupedIntervalJoin {

  /** Column selectors, mirroring the DataFrames.jl selector surface the
    * reference resolves against *two* frames (`src/DataFrameIntervals.jl:195-237`).
    * A plain name may live on either side; `All` and grouping by the `on`
    * column are rejected with the reference's (quirky, stale-named) errors. */
  sealed trait Selector
  object Selector {
    final case class Name(n: String)                extends Selector
    final case class Names(ns: Seq[String])         extends Selector
    final case class Pattern(re: String)            extends Selector
    final case class Not(inner: Selector)           extends Selector
    final case class Between(from: String, to: String) extends Selector
    final case class Predicate(f: String => Boolean) extends Selector
    case object All                                 extends Selector
    import scala.language.implicitConversions
    implicit def fromString(s: String): Selector = Name(s)
  }

  final class Grouped private[operators] (val joined: DataFrame, val groupColumns: Seq[String]) {
    def grouped: RelationalGroupedDataset = joined.groupBy(groupColumns.map(col): _*)
    def agg(e: Column, es: Column*): DataFrame = grouped.agg(e, es: _*)

    /** The distinct group keys, in deterministic (sorted) order — the
      * iteration order of the per-group view below. One driver-side collect
      * bounded by the group COUNT (not the data size), the same trade the
      * reference's `iterate` makes when it materializes per-group frames
      * (`src/DataFrameIntervals.jl:293-310`). Guarded by `maxGroups`
      * (default [[Grouped.DefaultMaxGroups]]): a high-cardinality `groups`
      * misuse fails with a clear error instead of a driver OOM — raise the
      * bound explicitly if you really mean to iterate that many groups, or
      * use [[agg]], the fused distributed path. */
    def keys: Array[org.apache.spark.sql.Row] = boundedKeys(Grouped.DefaultMaxGroups)

    def boundedKeys(maxGroups: Int): Array[org.apache.spark.sql.Row] = {
      require(maxGroups >= 1, s"maxGroups must be >= 1: $maxGroups")
      // saturating +1: Int.MaxValue means "no bound" — a plain increment
      // would overflow to a negative limit and fail inside Spark
      val lim = if (maxGroups == Int.MaxValue) maxGroups else maxGroups + 1
      val res = joined.select(groupColumns.map(col): _*).distinct()
        .orderBy(groupColumns.map(col): _*).limit(lim).collect()
      require(res.length <= maxGroups,
        s"groupbyIntervalJoin.keys/iterator collects the distinct group keys " +
          s"to the driver and this join has more than $maxGroups of them; " +
          s"use .agg(...) (the fused distributed path) or pass a larger " +
          s"maxGroups explicitly")
      res
    }

    /** The joined rows of one group, as a lazy view (no extra job until the
      * caller acts on it): a broadcast semi-join against the one-row key
      * frame. Null-safe on null-valued keys, and — unlike a `lit(value)`
      * predicate — works for ANY group-key type (arrays/structs included:
      * `lit` cannot build literals of those). */
    def groupFor(key: org.apache.spark.sql.Row): DataFrame = {
      val schema = joined.select(groupColumns.map(col): _*).schema
      val keyDf = joined.sparkSession.createDataFrame(
        java.util.Collections.singletonList(key), schema)
      val cond = groupColumns.map(c => joined(c) <=> keyDf(c)).reduce(_ && _)
      joined.join(org.apache.spark.sql.functions.broadcast(keyDf), cond, "left_semi")
    }

    /** Per-group iteration — the reference's `for gdf in
      * groupby_interval_join(...)` surface (`src/DataFrameIntervals.jl:
      * 293-310`): yields (group key, group DataFrame) in key order. Each
      * element is a lazy view; prefer [[agg]] when the downstream is an
      * aggregate — Catalyst fuses that into one distributed pass, while
      * iteration runs one filtered job per group. */
    def iterator: Iterator[(org.apache.spark.sql.Row, DataFrame)] =
      boundedIterator(Grouped.DefaultMaxGroups)

    def boundedIterator(maxGroups: Int): Iterator[(org.apache.spark.sql.Row, DataFrame)] =
      boundedKeys(maxGroups).iterator.map(k => k -> groupFor(k))
  }

  object Grouped {
    /** Driver-side key-collect bound for [[Grouped.keys]]/[[Grouped.iterator]]:
      * 100k small Rows is comfortably driver-sized; anything beyond it is
      * almost certainly an accidental high-cardinality iteration that the
      * fused [[Grouped.agg]] path should run instead. */
    val DefaultMaxGroups: Int = 100000
  }

  def groupbyIntervalJoin(
      left: DataFrame,
      right: DataFrame,
      groups: Seq[Selector],
      on: (String, String),
      opts: IntervalJoin.Options = IntervalJoin.Options()): Grouped = {
    val groupCols = resolve(groups, left, right, on, opts)
    val joined = IntervalJoin.intervalJoin(left, right, on, opts)
    new Grouped(joined, groupCols)
  }

  def groupbyIntervalJoin(left: DataFrame, right: DataFrame, groups: Seq[Selector],
      on: String): Grouped =
    groupbyIntervalJoin(left, right, groups, on -> on)

  /** Resolve selectors against both frames, mapping matches through
    * `renamecols` to the join's output names (reference resolves against
    * each side then splits, `src/DataFrameIntervals.jl:264-271`).
    *
    * Reference-exact `find_valid` semantics (`:195-237`):
    *  - every selector resolves over ALL of a side's columns (the `on`
    *    column included) and the resolved set is `check_oncol`-guarded
    *    (`:190-193`): a Pattern/Predicate/Between — or a Not whose skip set
    *    does not cover `on` — that selects the `on` column errors with the
    *    reference's (stale-named) `split_into_combine` message;
    *  - a Name/Between endpoint absent from a side resolves to an `Invalid`
    *    marker (`:206-207, 229-236`); names invalid on BOTH sides error
    *    "Columns do not exist" (`:272-275`) — invalid on one side only is
    *    fine (the other side resolves it);
    *  - `Not`'s skip set is taken as plain names (only the PRESENT ones are
    *    skipped, `:209-213`) with no oncol check of its own — skipping the
    *    `on` column is how `Not` is legitimately used (ref
    *    `test/runtests.jl:101`). */
  private def resolve(groups: Seq[Selector], left: DataFrame, right: DataFrame,
      on: (String, String), opts: IntervalJoin.Options): Seq[String] = {
    import Selector._
    val (lOn, rOn) = on
    val lAll = left.columns.toIndexedSeq
    val rAll = right.columns.toIndexedSeq

    def onColError(name: String): Nothing =
      // Stale function name preserved on purpose — the reference's own error
      // text says `split_into_combine` (src/DataFrameIntervals.jl:187-188).
      throw new IllegalArgumentException(
        s"Column $name cannot be used for grouping during a call to `split_into_combine`.")

    def checkOncol(names: Seq[String], onName: String): Seq[String] =
      if (names.contains(onName)) onColError(onName) else names

    // un-guarded resolution (used for Not's skip set, ref :209-213)
    def resolveRaw(sel: Selector, all: IndexedSeq[String]): Seq[String] = sel match {
      case All          => all
      case Name(n)      => all.filter(_ == n)
      case Names(ns)    => ns.flatMap(n => all.filter(_ == n))
      case Pattern(re)  => val r = re.r; all.filter(c => r.findFirstIn(c).isDefined)
      case Predicate(f) => all.filter(f)
      case Not(inner)   => all.filterNot(resolveRaw(inner, all).toSet)
      case Between(a, b) =>
        val ia = all.indexOf(a); val ib = all.indexOf(b)
        if (ia < 0 || ib < 0) Seq.empty
        else all.slice(math.min(ia, ib), math.max(ia, ib) + 1)
    }

    /** find_valid for one side: (valid names, invalid requested names). */
    def resolveOne(sel: Selector, all: IndexedSeq[String],
        onName: String): (Seq[String], Seq[String]) = sel match {
      case All => onColError(onName)
      case Name(n) =>
        if (all.contains(n)) (checkOncol(Seq(n), onName), Nil) else (Nil, Seq(n))
      case Names(ns) =>
        val rs = ns.map(n => resolveOne(Name(n), all, onName))
        (rs.flatMap(_._1), rs.flatMap(_._2))
      case Pattern(re) =>
        val r = re.r
        (checkOncol(all.filter(c => r.findFirstIn(c).isDefined), onName), Nil)
      case Predicate(f) => (checkOncol(all.filter(f), onName), Nil)
      case Not(inner) =>
        (checkOncol(all.filterNot(resolveRaw(inner, all).toSet), onName), Nil)
      case Between(a, b) =>
        // endpoints resolve as Names first (an endpoint == on errors, a
        // missing endpoint propagates Invalid; ref :229-236)
        val (_, ia) = resolveOne(Name(a), all, onName)
        val (_, ib) = resolveOne(Name(b), all, onName)
        if (ia.isEmpty && ib.isEmpty) {
          val iA = all.indexOf(a); val iB = all.indexOf(b)
          (checkOncol(all.slice(math.min(iA, iB), math.max(iA, iB) + 1), onName), Nil)
        } else (Nil, ia ++ ib)
    }

    val lRes = groups.map(resolveOne(_, lAll, lOn))
    val rRes = groups.map(resolveOne(_, rAll, rOn))
    val invalid = lRes.flatMap(_._2).intersect(rRes.flatMap(_._2)).distinct
    if (invalid.nonEmpty)
      throw new IllegalArgumentException("Columns do not exist: " + andJoin(invalid))

    val fromLeft = lRes.flatMap(_._1).map(opts.renamecols._1)
    val fromRight = rRes.flatMap(_._1).map(opts.renamecols._2)
    (fromLeft ++ fromRight).distinct
  }

  /** Julia-style list join: "a, b and c". */
  private def andJoin(xs: Seq[String]): String = xs match {
    case Seq()  => ""
    case Seq(a) => a
    case _      => xs.init.mkString(", ") + " and " + xs.last
  }
}
