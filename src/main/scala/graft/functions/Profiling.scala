package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data-profiling pass: the per-column health summary (row/null/distinct
  * counts, value range) every large-scale ingest runs before and after a
  * pipeline stage — schema drift, null regressions, and id-space changes
  * surface here before they corrupt a training run.
  */
object Profiling {

  /** One row PER COLUMN: (column, n_rows, n_nulls, n_distinct, min_str,
    * max_str). Min/max render as strings so the result schema is stable
    * whatever the column types. ONE aggregate job over one scan — not a
    * scan per column; the only caveat is that several exact
    * `count(DISTINCT)`s in one aggregate plan through Expand (one stream
    * per distinct), the standard Spark cost of exactness — swap in the
    * HLL sketch ([[Sketches.hllSketch]]) per column when an estimate is
    * enough at the 100 TB end. */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile requires at least one column")
    val missing = cols.filterNot(df.columns.contains)
    require(missing.isEmpty, s"no such column(s): ${missing.mkString(", ")}")
    val aggs = cols.flatMap { c =>
      Seq(count(col(c)).as(s"__cnt_$c"),
        countDistinct(col(c)).as(s"__dis_$c"),
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c"))
    }
    df.agg(count(lit(1)).as("__n"), aggs: _*)
      .select(explode(array(cols.map(c =>
        struct(lit(c).as("column"),
          col("__n").as("n_rows"),
          (col("__n") - col(s"__cnt_$c")).as("n_nulls"),
          col(s"__dis_$c").as("n_distinct"),
          col(s"__min_$c").as("min_str"),
          col(s"__max_$c").as("max_str"))): _*)).as("p"))
      .select("p.*")
  }
}
