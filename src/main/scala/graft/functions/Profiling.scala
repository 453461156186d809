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
    require(cols.forall(!_.startsWith("__")),
      "this operator reserves __-prefixed working names; rename the column(s)")
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

  /** Snapshot diff between two versions of a keyed table — dataset
    * versioning's CDC step: which keys were `added`, `removed`, or
    * `changed` (any `compareCols` value differs, null-safe) between the
    * old and current snapshot. Unchanged keys are omitted — on a 100 TB
    * corpus the diff is the small output, so downstream stages (an
    * incremental index refresh, a re-dedup of changed docs) touch only
    * the delta. ONE full-outer hash equi-join on the key; no hashing of
    * row contents, so a column added to `compareCols` never forces a
    * backfill. Keys must be unique per snapshot and non-null. */
  def diffSnapshots(old: DataFrame, cur: DataFrame, keyCol: String,
      compareCols: Seq[String]): DataFrame = {
    require(compareCols.nonEmpty, "diffSnapshots requires compare columns")
    // alias every column to a fresh name: the two snapshots are typically
    // derived from one lineage, and same-exprId references across a
    // self-join resolve ambiguously
    val o = old.select(col(keyCol).as("__ko") +:
      compareCols.map(c => col(c).as(s"__o_$c")): _*)
    val n = cur.select(col(keyCol).as("__kn") +:
      compareCols.map(c => col(c).as(s"__n_$c")): _*)
    val changed = compareCols
      .map(c => !(col(s"__o_$c") <=> col(s"__n_$c"))).reduce(_ || _)
    o.join(n, col("__ko") === col("__kn"), "full_outer")
      .withColumn("status",
        when(col("__ko").isNull, "added")
          .when(col("__kn").isNull, "removed")
          .when(changed, "changed"))
      .where(col("status").isNotNull)
      .select(coalesce(col("__ko"), col("__kn")).as(keyCol), col("status"))
  }
}
