package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

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

  /** `df`, repartitioned to `minParts` iff its estimated map-side
    * parallelism is below that; unchanged otherwise. The estimate reads
    * the LOGICAL plan only ([[estimatedMapParallelism]]) — the earlier
    * implementation asked `df.rdd.getNumPartitions`, which forces physical
    * planning of the subtree outside AQE (and plans it twice when the
    * caller then runs the returned frame). */
  def withMinParallelism(df: DataFrame, minParts: Int): DataFrame = {
    require(minParts >= 1, s"minParts must be >= 1: $minParts")
    if (estimatedMapParallelism(df) >= minParts) df else df.repartition(minParts)
  }

  /** Estimated map-side partition count of `df`, from the optimized
    * LOGICAL plan (no physical planning, no `.rdd`):
    *
    *  - an explicit `Repartition`/`RepartitionByExpression` pins the count
    *    (a non-shuffle coalesce is capped by its child's estimate);
    *  - a file-source leaf replays Spark's own `FilePartition` slice math
    *    over the file index's total size and file count — the same inputs
    *    the scan exec uses, so the estimate tracks what `.rdd` used to
    *    report without materializing the plan;
    *  - narrow unary nodes (project/filter/limit/...) pass through to
    *    their child; unions sum their children;
    *  - anything else — post-shuffle subtrees (aggregate/join/window run
    *    at `spark.sql.shuffle.partitions`), local relations, non-file
    *    relations — is assumed healthy. The helper is a SCAN repair;
    *    "no-op when unsure" is the production-safe default (never inject
    *    an exchange on a guess).
    */
  private[graft] def estimatedMapParallelism(df: DataFrame): Int = {
    val spark = df.sparkSession
    val conf = spark.sessionState.conf

    def fileSlices(rel: HadoopFsRelation): Int = {
      val openCost = conf.filesOpenCostInBytes
      val nFiles = math.max(rel.location.inputFiles.length, 1)
      val padded = rel.location.sizeInBytes + nFiles.toLong * openCost
      val minPartNum = conf.filesMinPartitionNum
        .getOrElse(spark.sparkContext.defaultParallelism)
      val bytesPerCore = padded / math.max(minPartNum, 1)
      val maxSplit = math.min(conf.filesMaxPartitionBytes,
        math.max(openCost, bytesPerCore))
      // bin-packing approximation: slices of `maxSplit` padded bytes; files
      // never split below row-group granularity, so this can only OVERcount
      // a big single-row-group file — erring toward no-op, the safe side
      math.max(1, math.ceil(padded.toDouble / math.max(maxSplit, 1L)).toInt)
    }

    def walk(p: LogicalPlan): Int = p match {
      case r: Repartition =>
        if (r.shuffle) r.numPartitions
        else math.min(r.numPartitions, walk(r.child))
      case r: RepartitionByExpression =>
        r.optNumPartitions.getOrElse(conf.numShufflePartitions)
      case l: LogicalRelation => l.relation match {
        case fs: HadoopFsRelation => fileSlices(fs)
        case _                    => Int.MaxValue
      }
      // saturating sum: any "assumed healthy" child (Int.MaxValue) must
      // keep the union healthy — a plain Int sum overflows negative and
      // would inject a spurious repartition on a healthy wide union
      case u: Union =>
        math.min(u.children.map(c => walk(c).toLong).sum,
          Int.MaxValue.toLong).toInt
      case _: Project | _: Filter | _: LocalLimit |
           _: GlobalLimit | _: Sample | _: SubqueryAlias =>
        walk(p.children.head)
      case _ => Int.MaxValue
    }
    walk(df.queryExecution.optimizedPlan)
  }

  /** [[withMinParallelism]] at the session default parallelism — "use every
    * core on the map side" for sources that can't split that far. */
  def parallelized(df: DataFrame): DataFrame =
    withMinParallelism(df, df.sparkSession.sparkContext.defaultParallelism)
}
