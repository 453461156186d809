package graft.intervals

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Generalized intervals with per-row bound flags — the engine's rendering
  * of the reference's `Intervals.Interval{T,L,R}` where `L, R ∈ {Closed,
  * Open}` are static type parameters (reference `src/DataFrameIntervals.jl:
  * 22-35`; the README's `Interval{Int,Closed,Closed}` example at
  * `README.md:29`). The reference's executed test paths only ever use
  * Closed-Open (SURVEY §1.2), which is [[IntervalCols]]' canonical form;
  * this module carries the bounds dynamically as two boolean struct fields
  * so any combination can flow through joins built on these predicates:
  * `df.join(other, BoundedIntervals.overlapsBounded(col("a"), col("b")))`.
  *
  * Representation: `struct<start:T, stop:T, lclosed:boolean, rclosed:boolean>`.
  * All pure Column expressions — codegen'd, NULL-propagating.
  */
object BoundedIntervals {

  /** Build a bounded interval struct. */
  def bounded(start: Column, stop: Column, lclosed: Column, rclosed: Column): Column =
    struct(start.as("start"), stop.as("stop"),
      lclosed.as("lclosed"), rclosed.as("rclosed"))

  /** Closed-Open view of a canonical interval (identity semantics with
    * [[IntervalCols]]). */
  def fromHalfOpen(i: Column): Column =
    bounded(i.getField("start"), i.getField("stop"), lit(true), lit(false))

  private def s(i: Column) = i.getField("start")
  private def e(i: Column) = i.getField("stop")
  private def lc(i: Column) = i.getField("lclosed")
  private def rc(i: Column) = i.getField("rclosed")

  /** Non-empty: start < stop, or the degenerate point [a, a] when BOTH
    * bounds are closed (Closed-Closed singletons are valid point sets;
    * every other bound combination at start == stop is empty). */
  def nonEmpty(i: Column): Column =
    s(i) < e(i) || (s(i) === e(i) && lc(i) && rc(i))

  /** Bound-sensitive overlap. Two non-empty intervals overlap unless one
    * ends before the other begins — where "ends at exactly the other's
    * start" still overlaps only when BOTH touching bounds are closed. */
  def overlapsBounded(l: Column, r: Column): Column = {
    val lBeforeR = e(l) < s(r) || (e(l) === s(r) && !(rc(l) && lc(r)))
    val rBeforeL = e(r) < s(l) || (e(r) === s(l) && !(rc(r) && lc(l)))
    nonEmpty(l) && nonEmpty(r) && !lBeforeR && !rBeforeL
  }

  /** Bound-aware intersection: the larger start wins (at a tie the result
    * bound is closed only when BOTH are closed); symmetrically for the
    * smaller stop. NULL if either input is NULL; may be an EMPTY interval
    * (check [[nonEmpty]] or guard with [[overlapsBounded]]). */
  def intersectBounded(l: Column, r: Column): Column =
    when(l.isNull || r.isNull, lit(null)).otherwise {
      val istart = greatest(s(l), s(r))
      val istop = least(e(l), e(r))
      val ilc = when(s(l) === s(r), lc(l) && lc(r))
        .when(s(l) > s(r), lc(l)).otherwise(lc(r))
      val irc = when(e(l) === e(r), rc(l) && rc(r))
        .when(e(l) < e(r), rc(l)).otherwise(rc(r))
      bounded(istart, istop, ilc, irc)
    }
}
