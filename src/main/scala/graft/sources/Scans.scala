package graft.sources

import org.apache.spark.sql.DataFrame

/** Scan-parallelism repair for few-partition sources.
  *
  * A parquet file is splittable only at row-group boundaries (and a gzip
  * text file not at all), so a source with fewer row groups than the
  * cluster has cores hands its ENTIRE map side — tokenization, hashing,
  * higher-order-function evaluation — to a handful of tasks, no matter how
  * many executors sit idle. The standard Spark remedy is an explicit
  * round-robin repartition right after the scan, applied ONLY when the
  * scan actually under-partitions: on a healthy 100 TB layout (thousands
  * of row groups) the condition is false and the call is an exact no-op —
  * no exchange enters the plan.
  *
  * Apply it AFTER pushed-down filters/projections (the input `df`, not the
  * raw scan) so predicate pushdown and column pruning are unaffected and
  * the shuffle, when it does fire, carries the narrowed rows only.
  */
object Scans {

  /** `df`, repartitioned to `minParts` iff its physical plan currently
    * yields fewer partitions than that; unchanged otherwise. */
  def withMinParallelism(df: DataFrame, minParts: Int): DataFrame = {
    require(minParts >= 1, s"minParts must be >= 1: $minParts")
    if (df.rdd.getNumPartitions >= minParts) df else df.repartition(minParts)
  }

  /** [[withMinParallelism]] at the session default parallelism — "use every
    * core on the map side" for sources that can't split that far. */
  def parallelized(df: DataFrame): DataFrame =
    withMinParallelism(df, df.sparkSession.sparkContext.defaultParallelism)
}
