package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.Sketches

/** Running sketches over unbounded streams — the online face of
  * [[graft.functions.Sketches]]. Both sketches are PURE AGGREGATIONS with
  * a fixed-size key domain, so the identical plan runs on a batch frame
  * or a stream: Structured Streaming keeps one state row per cell /
  * register forever (state bounded by the sketch dimensions, never the
  * stream), and after any prefix of batches the state EQUALS the batch
  * sketch of the union — no merge code, no custom state machine.
  */
object StreamingSketches {

  /** Running depth×width count-min sketch of `valueCol`: (row, bucket,
    * cnt) with cnt the running multiset count. State = at most
    * depth·width rows forever. Use `update`/`complete` output; lookups
    * compose via [[graft.functions.Sketches.cmsLookup]] against any
    * snapshot (the estimate is one-sided: est ≥ true, same as batch).
    * The frequency feed of an online heavy-hitter monitor: nominate on
    * the sketch, exact-verify offline (the q77 two-pass contract). */
  def cmsStream(df: DataFrame, valueCol: String, depth: Int, width: Int,
      salt: String = ""): DataFrame =
    Sketches.cmsSketch(df, valueCol, depth, width, salt)

  /** Running HyperLogLog registers of `valueCol`: (register, rho) with
    * rho the running max — 2^p state rows forever, estimable at any
    * point via [[graft.functions.Sketches.hllEstimate]] on the snapshot.
    * Distinct-count semantics over the whole stream prefix (the exact
    * distinct a stream cannot afford is precisely what this replaces). */
  def hllStream(df: DataFrame, valueCol: String, p: Int,
      salt: String = ""): DataFrame =
    Sketches.hllSketch(df, valueCol, p, salt)
}
