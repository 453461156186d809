package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Exact, engine-replayable statistics over integer-valued measures: the
  * model-diagnostics layer next to [[Profiling]]'s data health. Everything
  * here follows the repo's determinism discipline — moment sums accumulate
  * in DECIMAL(38,0) or pure longs (order-exact under any partitioning /
  * merge order; the built-in `regr_*`/`covar_*`/AUC-via-sort paths merge
  * doubles irreproducibly), closed forms run in IEEE double only at the
  * very end, and results round at 6 dp. */
object Stats {

  private val dec = DecimalType(38, 0)

  /** Per-group ordinary least squares y = intercept + slope·x over
    * INTEGER-valued columns (caller integer-izes — days, cents, micros):
    * six DECIMAL(38,0) moment sums in ONE map-side-combining aggregate
    * over one scan, then the closed form. `slope`/`intercept` are NULL on
    * zero x-variance, `r2` additionally NULL on zero y-variance. The
    * intercept uses the UNROUNDED slope (both engines derive it from
    * identical doubles); all three outputs round 6 dp. */
  def groupedOls(df: DataFrame, keys: Seq[String], xCol: String,
      yCol: String): DataFrame = {
    val x = col(xCol).cast(dec)
    val y = col(yCol).cast(dec)
    val agged = df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).cast(dec).as("__n"),
        sum(x).as("__sx"), sum(y).as("__sy"),
        sum(x * y).as("__sxy"), sum(x * x).as("__sxx"), sum(y * y).as("__syy"))
    val num = (col("__n") * col("__sxy") - col("__sx") * col("__sy")).cast("double")
    val dxx = (col("__n") * col("__sxx") - col("__sx") * col("__sx")).cast("double")
    val dyy = (col("__n") * col("__syy") - col("__sy") * col("__sy")).cast("double")
    val slope = num / dxx
    val intercept = (col("__sy").cast("double") - slope * col("__sx").cast("double")) /
      col("__n").cast("double")
    agged.select(keys.map(col) :+ col("__n").cast("long").as("n") :+
      when(dxx > 0.0, round(slope, 6)).as("slope") :+
      when(dxx > 0.0, round(intercept, 6)).as("intercept") :+
      when(dxx > 0.0 && dyy > 0.0, round(num * num / (dxx * dyy), 6)).as("r2"): _*)
  }

  /** Exact ROC AUC of `scoreCol` against boolean `labelCol` in PURE
    * INTEGER arithmetic — the Mann-Whitney statistic with the standard
    * tie correction: collapsing to one row per distinct score with
    * (pos_i, neg_i) counts, `AUC · 2·P·N = Σ pos_i · (2·C_i + neg_i)`
    * where C_i = negatives at strictly smaller scores. The running C_i
    * uses the bucket-offset prefix-sum pattern ([[Profiling.ksTest]]):
    * per-bucket totals (bucket = ⌊score·bucketScale⌋, a tiny frame) take
    * the one-task exclusive scan, the data-sized frame only ever sees a
    * PARTITIONED window — never a single-task global sort. Contributions
    * sum as DECIMAL(38,0) (P·N overflows int64 at corpus scale). Output:
    * one row (n_pos, n_neg, auc). */
  def rocAuc(df: DataFrame, scoreCol: String, labelCol: Column,
      bucketScale: Double = 1000.0): DataFrame = {
    require(bucketScale > 0, s"bucketScale must be positive: $bucketScale")
    val pts = df.select(col(scoreCol).cast("double").as("__s"),
      when(labelCol, 1L).otherwise(0L).as("__p"),
      when(labelCol, 0L).otherwise(1L).as("__q"))
    val byS = pts.groupBy("__s")
      .agg(sum("__p").as("__cp"), sum("__q").as("__cq"))
      .withColumn("__bk", floor(col("__s") * bucketScale).cast("long"))
    val bucketTotals = byS.groupBy("__bk").agg(sum("__cq").as("__tq"))
    val wOff = Window.orderBy("__bk")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = bucketTotals.select(col("__bk"),
      coalesce(sum("__tq").over(wOff), lit(0L)).as("__oq"))
    val wIn = Window.partitionBy("__bk").orderBy("__s")
      .rowsBetween(Window.unboundedPreceding, -1)
    val contrib = byS.join(broadcast(offs), "__bk")
      .select((col("__cp").cast(dec) *
        ((col("__oq") + coalesce(sum(col("__cq")).over(wIn), lit(0L))) * 2L +
          col("__cq")).cast(dec)).as("__c"))
    val n = pts.agg(sum("__p").as("n_pos"), sum("__q").as("n_neg"))
    contrib.agg(sum("__c").as("__a2")).crossJoin(broadcast(n))
      .select(col("n_pos"), col("n_neg"),
        round(col("__a2").cast("double") /
          (lit(2.0) * col("n_pos") * col("n_neg")), 6).as("auc"))
  }

  /** Join-key skew pre-flight — the sizing input for [[graft.operators.SkewJoin]]
    * salting and AQE skew thresholds: per-key counts roll to ONE row of
    * n_rows / n_keys / max_cnt / exact p50·p99 count percentiles /
    * avg_cnt / skew (= max·n_keys/n_rows, i.e. max over mean). The
    * percentile aggregate runs on the keys-sized count frame (the exact
    * interpolated form, the q89 discipline); the raw data pays one key
    * shuffle. */
  def skewProfile(df: DataFrame, keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "skewProfile needs at least one key column")
    require(!df.columns.contains("__c"), "skewProfile: reserved column __c present")
    val counts = df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("__c"))
    counts.agg(sum("__c").as("n_rows"), count(lit(1)).as("n_keys"),
        max("__c").as("max_cnt"),
        round(expr("percentile(__c, 0.5)"), 6).as("p50_cnt"),
        round(expr("percentile(__c, 0.99)"), 6).as("p99_cnt"))
      .select(col("n_rows"), col("n_keys"), col("max_cnt"),
        col("p50_cnt"), col("p99_cnt"),
        round(col("n_rows").cast("double") / col("n_keys"), 6).as("avg_cnt"),
        round(col("max_cnt").cast("double") * col("n_keys") / col("n_rows"), 6)
          .as("skew"))
  }

  /** Exact sample covariance matrix over INTEGER-valued columns in ONE
    * aggregate over ONE scan: every pairwise DECIMAL(38,0) moment sum in a
    * single row, exploded to (col_x, col_y, n, cov) with the diagonal
    * carrying the variances. cov = (n·Σxy − Σx·Σy) / (n·(n−1)), rounded
    * 6 dp, NULL when n < 2. The single result row is driver-sized however
    * wide the input — k columns cost k·(k+1)/2 sums, not k² passes. */
  def covMatrix(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "covMatrix needs at least one column")
    require(cols.distinct == cols, s"covMatrix: duplicate columns in $cols")
    val pairs = for (i <- cols.indices; j <- i until cols.length) yield (i, j)
    val sums =
      cols.map(c => sum(col(c).cast(dec)).as(s"__s_$c")) ++
      pairs.map { case (i, j) =>
        sum(col(cols(i)).cast(dec) * col(cols(j)).cast(dec))
          .as(s"__s_${cols(i)}_${cols(j)}")
      }
    val agged = df.agg(count(lit(1)).cast(dec).as("__n"), sums: _*)
    val rows = pairs.map { case (i, j) =>
      val num = (col("__n") * col(s"__s_${cols(i)}_${cols(j)}") -
        col(s"__s_${cols(i)}") * col(s"__s_${cols(j)}")).cast("double")
      val den = (col("__n") * (col("__n") - lit(1).cast(dec))).cast("double")
      struct(lit(cols(i)).as("col_x"), lit(cols(j)).as("col_y"),
        col("__n").cast("long").as("n"),
        when(col("__n") >= 2, round(num / den, 6)).as("cov"))
    }
    agged.select(explode(array(rows: _*)).as("__r"))
      .select(col("__r.col_x").as("col_x"), col("__r.col_y").as("col_y"),
        col("__r.n").as("n"), col("__r.cov").as("cov"))
  }
}
