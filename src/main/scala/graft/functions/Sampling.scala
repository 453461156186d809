package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import TextFunctions.tokenHashMod

/** Deterministic sampling / split assignment for training-data pipelines.
  *
  * Everything keys off a salted md5 hash of the row's key column, so:
  *  - assignment is REPRODUCIBLE across runs, engines, and cluster sizes
  *    (no RNG state, no partition dependence — unlike `df.sample`);
  *  - it is STABLE under appends: adding rows never reassigns existing keys;
  *  - related rows can share a fate by sharing a key (e.g. split by
  *    document id so all chunks of a document land in the same split —
  *    the standard guard against train/test leakage).
  * Pure codegen'd Column expressions; the hash is engine-reproducible
  * ([[TextFunctions.tokenHashMod]]), so a SQL oracle can verify splits.
  */
object Sampling {

  /** Number of hash buckets assignments are quantized to. */
  val Buckets = 1000L

  /** The salted per-key bucket in [0, Buckets). */
  def hashBucket(key: Column, salt: String): Column =
    tokenHashMod(concat(lit(s"$salt:"), key.cast("string"))) % Buckets

  /** Split-name column from cumulative fraction bounds, e.g.
    * `Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)` (fractions must sum
    * to ~1; the last split absorbs rounding). */
  def splitAssign(key: Column, fractions: Seq[(String, Double)],
      salt: String = "split"): Column = {
    require(fractions.nonEmpty, "need at least one split")
    require(math.abs(fractions.map(_._2).sum - 1.0) < 1e-9,
      s"split fractions must sum to 1, got ${fractions.map(_._2).sum}")
    val bucket = hashBucket(key, salt)
    val bounds = fractions.scanLeft(0.0)(_ + _._2).tail
      .map(f => math.round(f * Buckets))
    fractions.init.zip(bounds).foldRight(lit(fractions.last._1): Column) {
      case (((name, _), hi), acc) => when(bucket < hi, lit(name)).otherwise(acc)
    }
  }

  /** `df` plus a `split` column assigned deterministically by `keyCol`. */
  def splitByHash(df: DataFrame, keyCol: String,
      fractions: Seq[(String, Double)], salt: String = "split"): DataFrame =
    df.withColumn("split", splitAssign(col(keyCol), fractions, salt))

  /** Deterministic subsample: keeps `fraction` of keys (exact per-key
    * reproducibility, approximate fraction). Works identically on batch and
    * streams — it is a stateless filter. */
  def sampleByHash(df: DataFrame, keyCol: String, fraction: Double,
      salt: String = "sample"): DataFrame = {
    require(fraction >= 0 && fraction <= 1, s"fraction must be in [0,1]: $fraction")
    df.where(hashBucket(col(keyCol), salt) < math.round(fraction * Buckets))
  }

  /** Stratified deterministic subsample: a (possibly different) fraction
    * per stratum value; strata absent from the map keep `defaultFraction`. */
  def stratifiedSampleByHash(df: DataFrame, keyCol: String, strataCol: String,
      fractions: Map[String, Double], defaultFraction: Double = 0.0,
      salt: String = "sample"): DataFrame = {
    val frac = fractions.foldRight(lit(defaultFraction): Column) {
      case ((value, f), acc) => when(col(strataCol) === value, lit(f)).otherwise(acc)
    }
    df.where(hashBucket(col(keyCol), salt).cast("double") < frac * Buckets)
  }

  /** Exactly `min(n, |stratum|)` rows per stratum value, chosen by salted-
    * hash order over the key (ties by key) — the fixed-size eval-set /
    * per-domain-quota primitive that [[stratifiedSampleByHash]]'s
    * fraction-based filter can't give. Deterministic like everything here:
    * no RNG, stable across runs, engines, and cluster sizes; appending new
    * keys preserves the relative hash order of existing keys (a new key can
    * push ranks up and displace the hash-latest survivors, never reorder
    * or demote-below the ones that remain).
    *
    * Scale shape: a `row_number` window partitioned by stratum would be a
    * handful of giant partitions, but Spark's WindowGroupLimit inserts a
    * PARTIAL top-n per stratum on every map partition before the shuffle,
    * so the exchange carries at most n rows per (stratum, map partition) —
    * never the corpus. Output keeps the input columns plus a 1-based
    * `rank` within the stratum's hash order. */
  def takeNPerStratum(df: DataFrame, keyCol: String, strataCol: String,
      n: Int, salt: String = "taken"): DataFrame = {
    require(n >= 1, s"takeNPerStratum requires n >= 1, got $n")
    require(!df.columns.contains("rank"),
      "this operator writes `rank`; rename the existing column")
    val h = tokenHashMod(concat(lit(s"$salt:"), col(keyCol).cast("string")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(strataCol)).orderBy(h, col(keyCol))
    df.withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= n)
  }

  /** Weighted sampling WITHOUT replacement, n per stratum — the
    * Efraimidis–Spiliotopoulos A-ES scheme made deterministic: each key
    * draws an exponential race time `E = -ln(u)/w` from the salted-hash
    * uniform `u ∈ (0,1]` and the n smallest per stratum win. Heavier rows
    * win proportionally more often across salts, no row can win twice
    * (without replacement by construction), and like every sampler here
    * the draw is a pure function of (salt, key) — reproducible across
    * runs, engines, and cluster sizes, so a SQL oracle replays it.
    *
    * The race time is rounded to 6 dp (ties then break by key) so the only
    * float op (`ln`) can never let a sub-ulp engine difference reorder the
    * rank — same exactness discipline as the BM25/surprisal scores.
    * Weights must be non-null and > 0 (a zero weight has no valid race
    * time; filter those rows first). Scale shape: identical to
    * [[takeNPerStratum]] — WindowGroupLimit keeps a partial top-n per map
    * partition, so the per-stratum shuffle carries ≤ n rows per partition.
    * Output: input columns + the 1-based `rank` in race order. */
  def weightedTakeN(df: DataFrame, keyCol: String, weightCol: String,
      strataCol: String, n: Int, salt: String = "wtake"): DataFrame = {
    require(n >= 1, s"weightedTakeN requires n >= 1, got $n")
    require(!df.columns.contains("rank"),
      "this operator writes `rank`; rename the existing column")
    val w = when(col(weightCol).isNull || col(weightCol) <= 0, raise_error(
      lit(s"weightedTakeN requires non-null, positive `$weightCol` weights"))
      .cast("double")).otherwise(col(weightCol).cast("double"))
    val u = (tokenHashMod(concat(lit(s"$salt:"), col(keyCol).cast("string"))) + 1L)
      .cast("double") / lit((TextFunctions.HashMod + 1L).toDouble)
    val race = round(-log(u) / w, 6)
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy(col(strataCol)).orderBy(race, col(keyCol))
    df.withColumn("rank", row_number().over(win).cast("long"))
      .where(col("rank") <= n)
  }

  /** Global running sum of `valueCol` over the total order
    * (strataCols, bucket, orderCols), at scale — the distributed
    * `sum(v) OVER (ORDER BY ...)`, which as a bare window would serialize
    * the whole corpus through ONE task. The caller supplies `bucketCol`, a
    * deterministic coarse bucket that is MONOTONE in the order (so
    * (bucket, orderCols) sorts like orderCols): a bounded totals job (one
    * row per stratum × bucket to the driver) yields each bucket's global
    * offset, and the result is offset + within-bucket running sum — a
    * window PARTITIONED by (strata, bucket), so the sort parallelizes
    * across buckets. With `valueCol = 1`, the inclusive running sum is the
    * 1-based global row number.
    *
    * Why not `repartitionByRange` + physical-partition offsets (the RDD
    * zipWithIndex idiom): range boundaries are SAMPLED with a
    * per-execution seed, and the totals job and the final query are
    * separate executions — their partitionings could disagree, corrupting
    * every offset. Here the result depends only on the data, never on
    * physical partitioning, so it is reproducible across runs, cluster
    * sizes, and AQE decisions; the price is two passes over the input
    * (the cheap one a map-side-combining aggregation). */
  private def bucketPrefixSum(df: DataFrame, bucketCol: Column,
      valueCol: Column, strataCols: Seq[String], orderCols: Seq[Column],
      outName: String): DataFrame = {
    require(!df.columns.contains(outName),
      s"this operator writes `$outName`; rename the existing column")
    val clash = df.columns.toSet.intersect(Set("__bucket", "__off", "__v"))
    require(clash.isEmpty,
      s"this operator reserves ${clash.mkString(", ")}; rename the input column(s)")
    val spark = df.sparkSession
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    import scala.jdk.CollectionConverters._
    val bucketed = df.withColumn("__bucket", bucketCol)
      .withColumn("__v", valueCol.cast("long"))
    val keyCols = strataCols :+ "__bucket"
    val totals = bucketed.groupBy(keyCols.map(col): _*)
      .agg(sum("__v").as("__t")).collect()
    totals.foreach { r =>
      (0 to strataCols.length).foreach(i => require(!r.isNullAt(i),
        "shuffle/budget keys and strata must be non-null"))
    }
    // driver-side prefix per stratum across its buckets, bucket ascending —
    // bounded: one row per stratum × bucket
    val offsets = totals
      .map(r => (Vector.tabulate(strataCols.length)(r.get),
        r.getLong(strataCols.length), r.getLong(strataCols.length + 1)))
      .groupBy(_._1).toSeq.flatMap { case (_, rows) =>
        var acc = 0L
        rows.sortBy(_._2).map { case (sv, b, t) =>
          val o = acc; acc += t; Row.fromSeq(sv ++ Seq(b, o))
        }
      }
    val offSchema = StructType(
      strataCols.map(c => bucketed.schema(c).copy(name = c)) ++
        Seq(StructField("__bucket", LongType), StructField("__off", LongType)))
    val offDf = spark.createDataFrame(offsets.asJava, offSchema)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCols.map(col): _*).orderBy(orderCols: _*)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    bucketed.join(broadcast(offDf), keyCols)
      .withColumn(outName, col("__off") + sum(col("__v")).over(w))
      .drop("__bucket", "__v", "__off")
  }

  /** Number of hash-domain buckets [[globalShuffle]] splits the corpus
    * into. Each bucket is processed by one task and contributes one row to
    * the driver-side offset table — size it well above the cluster's task
    * slots (uniform hash keys keep buckets balanced at any corpus size). */
  val ShuffleBuckets = 1024L

  /** Deterministic corpus SHUFFLE: a total order by the salted key hash
    * (key itself as the tiebreak), with a contiguous 0-based `idxName`
    * position — the reproducible global shuffle a training pipeline runs
    * before sequence packing, using the same engine-replayable hash as
    * every sampler here. Because the hash is uniform on [0, HashMod), the
    * coarse buckets are fixed equal-width slices of the hash domain — no
    * sampling, no skew, bit-identical across runs and cluster sizes. */
  def globalShuffle(df: DataFrame, keyCol: String, salt: String = "shuffle",
      idxName: String = "idx"): DataFrame = {
    require(!df.columns.contains("__hkey"),
      "globalShuffle reserves __hkey; rename the input column")
    val width = (TextFunctions.HashMod + ShuffleBuckets - 1L) / ShuffleBuckets
    val hkey = tokenHashMod(concat(lit(s"$salt:"), col(keyCol).cast("string")))
    // bucketPrefixSum with valueCol=1 yields the 1-based global row number;
    // subtract 1 for the 0-based contiguous position the contract promises.
    bucketPrefixSum(
      df.withColumn("__hkey", hkey),
      expr(s"__hkey div ${width}L"), // integer div: no double rounding ever
      valueCol = lit(1L), strataCols = Seq.empty,
      orderCols = Seq(col("__hkey"), col(keyCol)), outName = idxName)
      .withColumn(idxName, col(idxName) - 1L)
      .drop("__hkey")
  }

  /** Deterministic token-budget cap: keep the corpus PREFIX — in the same
    * salted hash-shuffle order as [[globalShuffle]] — whose inclusive
    * running `valueCol` total stays within `budget`: "take the first B
    * tokens of the shuffled corpus", the budget step of a training-data
    * pipeline. With `strataCols` the budget applies PER STRATUM over the
    * same order (e.g. a per-language token budget). A row is kept iff
    * `sum(value) OVER (PARTITION BY strata ORDER BY hash, key) <= budget`
    * — exactly what a SQL oracle replays — so membership is reproducible
    * across runs, cluster sizes, and appends that don't disturb kept
    * hashes' prefix. Computed with the bucket-offset prefix sum
    * ([[bucketPrefixSum]]): the sort parallelizes across the fixed hash
    * buckets, never a one-task global window. Null or negative values
    * raise rather than silently corrupting the running total. */
  def capByBudget(df: DataFrame, keyCol: String, valueCol: String,
      budget: Long, strataCols: Seq[String] = Seq.empty,
      salt: String = "budget"): DataFrame = {
    require(budget >= 0L, s"budget must be nonnegative: $budget")
    require(!df.columns.contains("__hkey"),
      "capByBudget reserves __hkey; rename the input column")
    val width = (TextFunctions.HashMod + ShuffleBuckets - 1L) / ShuffleBuckets
    val hkey = tokenHashMod(concat(lit(s"$salt:"), col(keyCol).cast("string")))
    val v = when(col(valueCol).isNull || col(valueCol) < 0, raise_error(
      lit(s"capByBudget requires non-null, nonnegative `$valueCol` values"))
      .cast("long")).otherwise(col(valueCol).cast("long"))
    bucketPrefixSum(
      df.withColumn("__hkey", hkey),
      expr(s"__hkey div ${width}L"),
      valueCol = v, strataCols = strataCols,
      orderCols = Seq(col("__hkey"), col(keyCol)), outName = "__cum")
      .where(col("__cum") <= budget)
      .drop("__hkey", "__cum")
  }

  /** [[capByBudget]] with a DIFFERENT budget per stratum value (strata
    * absent from the map keep `defaultBudget`) — the per-domain token
    * budgets of a real training mix (e.g. en 1B, fr 200M). Same order,
    * same running-sum membership rule, one strata column. */
  def capByBudgetPerStratum(df: DataFrame, keyCol: String, valueCol: String,
      strataCol: String, budgets: Map[String, Long],
      defaultBudget: Long = 0L, salt: String = "budget"): DataFrame = {
    require(budgets.values.forall(_ >= 0L) && defaultBudget >= 0L,
      "budgets must be nonnegative")
    require(!df.columns.contains("__hkey"),
      "capByBudgetPerStratum reserves __hkey; rename the input column")
    val width = (TextFunctions.HashMod + ShuffleBuckets - 1L) / ShuffleBuckets
    val hkey = tokenHashMod(concat(lit(s"$salt:"), col(keyCol).cast("string")))
    val v = when(col(valueCol).isNull || col(valueCol) < 0, raise_error(
      lit(s"capByBudgetPerStratum requires non-null, nonnegative `$valueCol` values"))
      .cast("long")).otherwise(col(valueCol).cast("long"))
    // sorted fold: Map iteration order must not leak into the plan
    val budget = budgets.toSeq.sortBy(_._1)
      .foldRight(lit(defaultBudget): Column) { case ((value, b), acc) =>
        when(col(strataCol) === value, lit(b)).otherwise(acc)
      }
    bucketPrefixSum(
      df.withColumn("__hkey", hkey),
      expr(s"__hkey div ${width}L"),
      valueCol = v, strataCols = Seq(strataCol),
      orderCols = Seq(col("__hkey"), col(keyCol)), outName = "__cum")
      .where(col("__cum") <= budget)
      .drop("__hkey", "__cum")
  }

  /** Temperature-scaled mixture weights — the data-mix step behind
    * multilingual / multi-domain sampling (alpha-smoothing of the natural
    * distribution, as in multilingual pretraining recipes): given
    * per-stratum counts `c_s`, the target mixture is
    * `p_s = c_s^alpha / sum_t c_t^alpha`, and the per-row repetition weight
    * that realizes it at unchanged corpus size is `w_s = p_s * N / c_s`
    * (alpha = 1 keeps the natural mix, w = 1 everywhere; alpha = 0 targets
    * the uniform mix; alpha in between upsamples the tail). Output: one row
    * per stratum — (stratum, cnt, p, weight), p/weight rounded to 6 dp so
    * cross-engine `pow` ulp differences cannot surface.
    *
    * Scale shape: the corpus contributes ONE map-side-combining count
    * aggregate; everything after runs on one row per stratum (strata are
    * languages/domains — bounded small by construction, documented). The
    * denominator folds over strata in SORTED stratum order from a 0.0 seed,
    * so the float addition order is engine-identical and a SQL oracle
    * replays it exactly. */
  def temperatureWeights(df: DataFrame, strataCol: String,
      alpha: Double): DataFrame = {
    require(alpha >= 0.0 && alpha <= 1.0, s"alpha must be in [0,1]: $alpha")
    val counts = df.groupBy(col(strataCol)).agg(count(lit(1)).as("cnt"))
    def pa(c: Column): Column = pow(c.cast("double"), lit(alpha))
    counts
      .agg(sort_array(collect_list(struct(col(strataCol).as("s"), col("cnt"))))
        .as("__xs"))
      .select(col("__xs"),
        aggregate(transform(col("__xs"), x => pa(x.getField("cnt"))),
          lit(0.0), (a, v) => a + v).as("__den"),
        aggregate(transform(col("__xs"), x => x.getField("cnt")),
          lit(0L), (a, v) => a + v).as("__n"))
      .select(explode(col("__xs")).as("__x"), col("__den"), col("__n"))
      .select(col("__x.s").as(strataCol), col("__x.cnt").as("cnt"),
        round(pa(col("__x.cnt")) / col("__den"), 6).as("p"),
        round(pa(col("__x.cnt")) / col("__den") * col("__n") / col("__x.cnt"), 6)
          .as("weight"))
  }

  /** [[resampleByWeight]] driven by [[temperatureWeights]]: resample the
    * corpus toward the alpha-smoothed mixture. The weights table (one row
    * per stratum, bounded small) is collected to the driver and applied as
    * the deterministic repetition map — same hash-Bernoulli semantics, so
    * the result is reproducible and append-stable like every sampler here. */
  def resampleToTemperature(df: DataFrame, keyCol: String, strataCol: String,
      alpha: Double, salt: String = "resample"): DataFrame = {
    val w = temperatureWeights(df, strataCol, alpha)
      .select(col(strataCol).cast("string"), col("weight")).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    resampleByWeight(df, keyCol, strataCol, w, defaultWeight = 1.0, salt = salt)
  }

  def resampleByWeight(df: DataFrame, keyCol: String, strataCol: String,
      weights: Map[String, Double], defaultWeight: Double = 1.0,
      salt: String = "resample"): DataFrame = {
    require(weights.values.forall(_ >= 0) && defaultWeight >= 0,
      "mixture weights must be nonnegative")
    require(!df.columns.contains("epoch"),
      "resampleByWeight writes an `epoch` column; rename the existing one")
    // sorted fold: Map iteration order must not leak into the plan
    val w = weights.toSeq.sortBy(_._1).foldRight(lit(defaultWeight): Column) {
      case ((value, f), acc) => when(col(strataCol) === value, lit(f)).otherwise(acc)
    }
    val copies = floor(w).cast("long") +
      when(hashBucket(col(keyCol), salt).cast("double") < (w - floor(w)) * Buckets,
        lit(1L)).otherwise(lit(0L))
    df.withColumn("__copies", copies)
      .where(col("__copies") > 0L)
      .withColumn("epoch", explode(sequence(lit(0L), col("__copies") - 1L)))
      .drop("__copies")
  }
}
