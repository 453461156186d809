package graft.streaming

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Collision-free composite grouping key for the streaming operators: each
  * field is tagged (`N` for NULL, else `V<len>:<value>`) so ("ab","c") never
  * collides with ("a","bc") and ("a",NULL) never with (NULL,"a") — a raw
  * separator-concat collides on both (and concat_ws silently skips NULLs).
  * One implementation shared by every keyed streaming operator so a future
  * encoding fix cannot diverge between them. */
private[streaming] object CompositeKey {
  def of(cols: Seq[Column]): Column =
    concat(cols.map { c =>
      val s = c.cast("string")
      when(s.isNull, lit("N")).otherwise(concat(lit("V"), length(s), lit(":"), s))
    }: _*)
}
