package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming data-quality monitor — the online face of
  * [[graft.functions.Profiling.profile]]: running per-column row/null
  * counts and value range over an unbounded stream, the live ingest
  * dashboard that catches a schema break or null regression while the
  * pipeline is running rather than at the next batch audit.
  */
object StreamingProfile {

  /** Running (column, n_rows, n_nulls, min_str, max_str) — one state row
    * per PROFILED COLUMN forever, so memory is bounded by the column list,
    * not the stream. Exact distinct counts are deliberately absent (their
    * state grows with the value space on a stream); compose
    * [[graft.functions.Sketches.hllSketch]] per column when an estimate is
    * needed. The same plan runs identically on a batch frame (then it IS
    * `profile` minus the distinct column). Sinks: `update` or `complete`
    * output mode (running aggregation, no watermark). */
  def profileStream(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profileStream requires at least one column")
    val missing = cols.filterNot(df.columns.contains)
    require(missing.isEmpty, s"no such column(s): ${missing.mkString(", ")}")
    val rows = df.select(explode(array(cols.map(c =>
      struct(lit(c).as("column"),
        col(c).isNull.as("isnull"),
        col(c).cast("string").as("v"))): _*)).as("p"))
      .select("p.*")
    rows.groupBy("column").agg(
      count(lit(1)).as("n_rows"),
      sum(when(col("isnull"), 1L).otherwise(0L)).as("n_nulls"),
      min(col("v")).as("min_str"),
      max(col("v")).as("max_str"))
  }
}
