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
    // totals from the per-score frame, NOT pts: a global agg over pts has
    // a different exchange shape than byS's, so Catalyst can't reuse it
    // and the (possibly expensive) score column would evaluate twice
    val n = byS.agg(sum("__cp").as("n_pos"), sum("__cq").as("n_neg"))
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

  /** EXACT interpolated quantiles at corpus scale via distributed rank
    * selection — the scalable form of `percentile()` (which buffers every
    * group value in one aggregation buffer; fine per small group, fatal on
    * a 100 TB column): the data collapses to (distinct value, count), the
    * running cumulative uses the bucket-offset prefix sum ([[rocAuc]] /
    * ksTest — the value-domain bucket totals take the one-task scan, the
    * data-sized frame only sees a PARTITIONED window), and each quantile's
    * two order statistics come from a broadcast rank-probe join. The
    * interpolation replicates `percentile`'s own op order
    * (`v_lo + (v_hi − v_lo)·frac`, pos = q·(n−1)) so results agree with
    * the built-in (and DuckDB's `quantile_cont`) bitwise pre-round; output
    * rounds 6 dp. Output: one row per q — (q, val). */
  def exactQuantiles(df: DataFrame, valCol: String, qs: Seq[Double]): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q >= 0.0 && q <= 1.0),
      s"quantiles must lie in [0, 1]: $qs")
    require(qs.distinct == qs, s"duplicate quantiles: $qs")
    val vals = df.select(col(valCol).cast("double").as("__v"))
      .where(col("__v").isNotNull)
    val byV = vals.groupBy("__v").agg(count(lit(1)).as("__c"))
      .withColumn("__bk", floor(col("__v")).cast("long"))
    val bucketTotals = byV.groupBy("__bk").agg(sum("__c").as("__t"))
    val wOff = Window.orderBy("__bk")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = bucketTotals.select(col("__bk"),
      coalesce(sum("__t").over(wOff), lit(0L)).as("__o"))
    val wIn = Window.partitionBy("__bk").orderBy("__v")
      .rowsBetween(Window.unboundedPreceding, 0)
    val runs = byV.join(broadcast(offs), "__bk")
      .select(col("__v"),
        (col("__o") + sum("__c").over(wIn)).as("__cum"),
        (col("__o") + sum("__c").over(wIn) - col("__c")).as("__lo"))
    val n = vals.agg(count(lit(1)).as("__n"))
    val h = col("q") * (col("__n").cast("double") - 1.0)
    val targets = n.where(col("__n") > 0)
      .select(explode(array(qs.map(lit): _*)).as("q"), col("__n"))
      .select(col("q"), h.as("__h"))
      .select(col("q"), (col("__h") - floor(col("__h"))).as("__frac"),
        explode(array(
          struct(lit(0).as("w"), floor(col("__h")).cast("long").as("i")),
          struct(lit(1).as("w"), ceil(col("__h")).cast("long").as("i"))))
          .as("__t"))
      .select(col("q"), col("__frac"),
        col("__t.w").as("__w"), col("__t.i").as("__i"))
    runs.join(broadcast(targets),
        col("__i") >= col("__lo") && col("__i") < col("__cum"))
      .groupBy("q", "__frac")
      .agg(min(when(col("__w") === 0, col("__v"))).as("__v0"),
        min(when(col("__w") === 1, col("__v"))).as("__v1"))
      .select(col("q"),
        round(col("__v0") + (col("__v1") - col("__v0")) * col("__frac"), 6)
          .as("val"))
  }

  /** Welch's unequal-variance two-sample t-test over an INTEGER-valued
    * measure, fully deterministic: both groups' (n, Σx, Σx²) come from ONE
    * single-row aggregate over one scan (DECIMAL(38,0) sums), then the t
    * statistic and Welch–Satterthwaite df run in double — every operand
    * derives from exact integers, so any engine agrees bitwise pre-round.
    * NULL t/df when either group is smaller than 2 or both variances are
    * zero. Output: one row (n_a, n_b, mean_a, mean_b, t, df). */
  def welchT(df: DataFrame, groupCol: String, valCol: String,
      groupA: String, groupB: String): DataFrame = {
    val isA = col(groupCol) === groupA
    val x = col(valCol).cast(dec)
    val g = df.where(col(groupCol).isin(groupA, groupB))
      .agg(
        sum(when(isA, 1L).otherwise(0L)).as("__na"),
        sum(when(!isA, 1L).otherwise(0L)).as("__nb"),
        sum(when(isA, x).otherwise(lit(0).cast(dec))).as("__sa"),
        sum(when(!isA, x).otherwise(lit(0).cast(dec))).as("__sb"),
        sum(when(isA, x * x).otherwise(lit(0).cast(dec))).as("__qa"),
        sum(when(!isA, x * x).otherwise(lit(0).cast(dec))).as("__qb"))
    val na = col("__na").cast("double"); val nb = col("__nb").cast("double")
    def variance(n: Column, s: Column, q: Column) =
      (n * q.cast("double") - s.cast("double") * s.cast("double")) /
        (n * (n - 1.0))
    val va = variance(na, col("__sa"), col("__qa"))
    val vb = variance(nb, col("__sb"), col("__qb"))
    val se2 = va / na + vb / nb
    val t = (col("__sa").cast("double") / na - col("__sb").cast("double") / nb) /
      sqrt(se2)
    val dfw = se2 * se2 /
      ((va / na) * (va / na) / (na - 1.0) + (vb / nb) * (vb / nb) / (nb - 1.0))
    val ok = col("__na") >= 2 && col("__nb") >= 2 && se2 > 0.0
    g.select(col("__na").as("n_a"), col("__nb").as("n_b"),
      round(col("__sa").cast("double") / na, 6).as("mean_a"),
      round(col("__sb").cast("double") / nb, 6).as("mean_b"),
      when(ok, round(t, 6)).as("t"),
      when(ok, round(dfw, 6)).as("df"))
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

  /** Pearson χ² test of independence between two categorical columns, with
    * Cramér's V effect size — "is doc language independent of source?" as a
    * one-row answer. The ONLY data-sized operation is the (a, b) contingency
    * aggregate (map-side combining); row totals, column totals, and the
    * grand total all DERIVE from that vocab-bounded cell frame, so the
    * expected-count join never touches the corpus again. Determinism: every
    * expected count is `ra·cb/n` evaluated double·double/double in a fixed
    * op order (doubles first — the BIGINT product would overflow at corpus
    * scale), each cell's (o−e)²/e term rounds at 6 dp, and the terms sum as
    * DECIMAL(18,6) — order-exact under any partitioning. NULL rows in
    * either column are excluded (a test over observed pairs). Output: one
    * row (n, n_a, n_b, dof, chi2, cramers_v); `cramers_v` is NULL when
    * either margin is a single category (dof = 0). */
  def chiSquareIndependence(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    require(aCol != bCol, "chiSquareIndependence needs two distinct columns")
    val cells = df.where(col(aCol).isNotNull && col(bCol).isNotNull)
      .groupBy(col(aCol).as("__a"), col(bCol).as("__b"))
      .agg(count(lit(1)).as("__o"))
    val rowT = cells.groupBy("__a").agg(sum("__o").as("__ra"))
    val colT = cells.groupBy("__b").agg(sum("__o").as("__cb"))
    val tot = cells.agg(sum("__o").as("__n"),
      countDistinct(col("__a")).as("__r"), countDistinct(col("__b")).as("__c"))
    val e = col("__ra").cast("double") * col("__cb").cast("double") /
      col("__n").cast("double")
    val d = col("__o").cast("double") - e
    val joined = cells.join(rowT, "__a").join(colT, "__b")
      .crossJoin(broadcast(tot))
      .select(col("__n"), col("__r"), col("__c"),
        round(d * d / e, 6).cast(DecimalType(18, 6)).as("__term"))
    val dof = (col("__r") - 1) * (col("__c") - 1)
    joined.groupBy("__n", "__r", "__c")
      .agg(sum("__term").as("__chi2"))
      .select(col("__n").as("n"), col("__r").as("n_a"), col("__c").as("n_b"),
        dof.as("dof"),
        col("__chi2").cast("double").as("chi2"),
        when(dof > 0, round(
          sqrt(col("__chi2").cast("double") /
            (col("__n").cast("double") *
              least(col("__r") - 1, col("__c") - 1).cast("double"))), 6))
          .as("cramers_v"))
  }

  /** Mutual information (and marginal entropies) between two categorical
    * columns, in nats — the information-theoretic sibling of
    * [[chiSquareIndependence]], same plan: ONE data-sized contingency
    * aggregate, everything else on the vocab-bounded cell frame. Each
    * cell's `(c/n)·ln(c·n/(ra·cb))` term and each margin's entropy term
    * round at 6 dp and sum as DECIMAL(18,6) (order-exact; `ln` of
    * identical doubles agrees across engines — the q59/q132 discipline).
    * Output: one row (n, mi, h_a, h_b, nmi) with
    * `nmi = mi/sqrt(h_a·h_b)` (NULL when either entropy is zero). */
  def mutualInformation(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    require(aCol != bCol, "mutualInformation needs two distinct columns")
    val cells = df.where(col(aCol).isNotNull && col(bCol).isNotNull)
      .groupBy(col(aCol).as("__a"), col(bCol).as("__b"))
      .agg(count(lit(1)).as("__o"))
    val rowT = cells.groupBy("__a").agg(sum("__o").as("__ra"))
    val colT = cells.groupBy("__b").agg(sum("__o").as("__cb"))
    val tot = cells.agg(sum("__o").as("__n"))
    def entTerm(c: Column, n: Column): Column = {
      val p = c.cast("double") / n.cast("double")
      round(-p * log(p), 6).cast(DecimalType(18, 6))
    }
    val ha = rowT.crossJoin(broadcast(tot))
      .agg(sum(entTerm(col("__ra"), col("__n"))).as("__ha"))
    val hb = colT.crossJoin(broadcast(tot))
      .agg(sum(entTerm(col("__cb"), col("__n"))).as("__hb"))
    val p = col("__o").cast("double") / col("__n").cast("double")
    val ratio = col("__o").cast("double") * col("__n").cast("double") /
      (col("__ra").cast("double") * col("__cb").cast("double"))
    val miSum = cells.join(rowT, "__a").join(colT, "__b")
      .crossJoin(broadcast(tot))
      .select(col("__n"),
        round(p * log(ratio), 6).cast(DecimalType(18, 6)).as("__term"))
      .groupBy("__n").agg(sum("__term").as("__mi"))
    val haD = col("__ha").cast("double"); val hbD = col("__hb").cast("double")
    miSum.crossJoin(broadcast(ha)).crossJoin(broadcast(hb))
      .select(col("__n").as("n"), col("__mi").cast("double").as("mi"),
        haD.as("h_a"), hbD.as("h_b"),
        when(haD > 0.0 && hbD > 0.0,
          round(col("__mi").cast("double") / sqrt(haD * hbD), 6)).as("nmi"))
  }

  /** Classifier calibration curve (reliability diagram): scores in [0, 1]
    * bucket into `nBins` equal-width bins (`least(floor(s·nBins),
    * nBins−1)` so 1.0 lands in the top bin), each bin reporting size,
    * positives, mean score, and positive rate. Scores are expected
    * already 6-dp-rounded (every graft scorer emits that), so
    * `round(s·1e6)` is an exact integer — the mean accumulates as a
    * DECIMAL sum of those integers, order-exact, with ONE division at the
    * end. One map-side-combining aggregate over one scan. Output:
    * (bin, n, n_pos, mean_score, pos_rate). */
  def calibrationCurve(df: DataFrame, scoreCol: String, labelCol: Column,
      nBins: Int): DataFrame = {
    require(nBins >= 2, s"calibrationCurve requires nBins >= 2, got $nBins")
    val s = col(scoreCol).cast("double")
    val bin = greatest(lit(0L),
      least(floor(s * nBins).cast("long"), lit(nBins - 1L)))
    val fixed = round(s * 1e6, 0).cast(DecimalType(38, 0))
    df.where(col(scoreCol).isNotNull)
      .select(bin.as("bin"), fixed.as("__fx"),
        when(labelCol, 1L).otherwise(0L).as("__y"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"), sum("__y").as("n_pos"),
        sum("__fx").as("__sfx"))
      .select(col("bin"), col("n"), col("n_pos"),
        round(col("__sfx").cast("double") /
          (col("n").cast("double") * 1e6), 6).as("mean_score"),
        round(col("n_pos").cast("double") / col("n").cast("double"), 6)
          .as("pos_rate"))
  }

  /** CUPED variance-reduced experiment readout (Deng et al., WSDM '13):
    * per-arm mean of `metricCol` adjusted by the pre-experiment covariate,
    * `mean_adj = ȳ_arm − θ·(x̄_arm − x̄_pooled)` with the pooled
    * `θ = cov(x, y)/var(x)`. Over INTEGER-valued columns (caller
    * integer-izes) every moment accumulates as DECIMAL(38,0) in ONE
    * single-row aggregate plus ONE arm-keyed aggregate — both map-side
    * combining — and the closed form runs in double at the end (identical
    * operands ⇒ any engine agrees bitwise pre-round). Zero covariate
    * variance ⇒ θ = 0 (adjustment is a no-op, not a NULL — the readout
    * degrades to the raw means). Output: one row per arm
    * (arm, n, mean, mean_adj, theta), means rounded 6 dp. */
  def cuped(df: DataFrame, armCol: String, metricCol: String,
      covCol: String): DataFrame = {
    val y = col(metricCol).cast(dec)
    val x = col(covCol).cast(dec)
    val pooled = df.agg(count(lit(1)).cast(dec).as("__n"),
      sum(x).as("__sx"), sum(y).as("__sy"),
      sum(x * y).as("__sxy"), sum(x * x).as("__sxx"))
    val covxy = (col("__n") * col("__sxy") - col("__sx") * col("__sy"))
      .cast("double")
    val varx = (col("__n") * col("__sxx") - col("__sx") * col("__sx"))
      .cast("double")
    val stats = pooled.select(
      when(varx > 0.0, covxy / varx).otherwise(0.0).as("__theta"),
      (col("__sx").cast("double") / col("__n").cast("double")).as("__xbar"))
    val arms = df.groupBy(col(armCol).as("arm"))
      .agg(count(lit(1)).as("n"), sum(y).as("__ay"), sum(x).as("__ax"))
    val meanY = col("__ay").cast("double") / col("n").cast("double")
    val meanX = col("__ax").cast("double") / col("n").cast("double")
    arms.crossJoin(broadcast(stats))
      .select(col("arm"), col("n"), round(meanY, 6).as("mean"),
        round(meanY - col("__theta") * (meanX - col("__xbar")), 6)
          .as("mean_adj"),
        round(col("__theta"), 6).as("theta"))
  }

  /** Sample-ratio-mismatch check: χ² goodness of fit of the observed arm
    * counts against the DESIGNED split (the first health check of any
    * experiment readout — a mismatched split invalidates everything
    * downstream). `expected` maps arm → design weight (normalized by
    * their sum); rows with arms outside the design are ignored, designed
    * arms with no rows count 0 (that IS the signal). One data-sized
    * aggregate; the k-row design frame anchors on the single total row.
    * Per-arm (o−e)²/e terms round 6 dp and sum as DECIMAL(18,6). Output:
    * one row (n, k, dof, chi2). */
  def srmCheck(df: DataFrame, armCol: String,
      expected: Seq[(String, Double)]): DataFrame = {
    require(expected.nonEmpty, "srmCheck requires at least one designed arm")
    require(expected.map(_._1).distinct.size == expected.size,
      s"duplicate arms in the design: ${expected.map(_._1)}")
    require(expected.forall(_._2 > 0.0),
      s"design weights must be positive: $expected")
    val wSum = expected.map(_._2).sum
    val cnts = df.where(col(armCol).isin(expected.map(_._1): _*))
      .groupBy(col(armCol).as("__arm")).agg(count(lit(1)).as("__o"))
    val tot = cnts.agg(coalesce(sum("__o"), lit(0L)).as("__t"))
    val design = tot.select(col("__t"), explode(array(expected.map {
      case (a, w) => struct(lit(a).as("arm"), lit(w / wSum).as("p"))
    }: _*)).as("__e"))
      .select(col("__t"), col("__e.arm").as("__arm"), col("__e.p").as("__p"))
    val o = coalesce(col("__o"), lit(0L)).cast("double")
    val e = col("__t").cast("double") * col("__p")
    // the division stays inside a when-guard: on an EMPTY input the design
    // frame still materializes (k rows, total 0) and ANSI mode would raise
    // on the eager 0/0
    val terms = design.join(cnts, Seq("__arm"), "left")
      .select(col("__t"),
        when(col("__t") > 0, round((o - e) * (o - e) / e, 6))
          .cast(DecimalType(18, 6)).as("__x"))
    terms.groupBy("__t").agg(sum("__x").as("__chi2"))
      .select(col("__t").as("n"), lit(expected.size.toLong).as("k"),
        lit(expected.size.toLong - 1L).as("dof"),
        col("__chi2").cast("double").as("chi2"))
  }

  /** Per-group EXACT interpolated quantiles — [[exactQuantiles]] grouped.
    * The grouped case needs NO bucket-offset machinery: the running
    * cumulative is a window PARTITIONED by the group key (per-group order,
    * never a one-task global sort), rank targets derive from the per-group
    * counts, and each q's two order statistics arrive via a group-keyed
    * equi-join with the rank-range residual. Interpolation replicates the
    * built-in `percentile` op order; result rounds 6 dp. Output: one row
    * per (group, q): (keys..., q, val). */
  def exactQuantilesBy(df: DataFrame, keys: Seq[String], valCol: String,
      qs: Seq[Double]): DataFrame = {
    require(keys.nonEmpty, "exactQuantilesBy requires at least one key")
    require(qs.nonEmpty && qs.forall(q => q >= 0.0 && q <= 1.0),
      s"quantiles must lie in [0, 1]: $qs")
    require(qs.distinct == qs, s"duplicate quantiles: $qs")
    // every internal working name AND both output names — a key named
    // "val" or "__frac" would otherwise surface as a duplicate/ambiguous
    // column instead of a clear error
    val reserved = Seq("__v", "__c", "__cum", "__lo", "__n", "__frac",
      "__w", "__i", "__t", "__v0", "__v1", "q", "val")
    require(!keys.exists(reserved.contains),
      s"keys clash with reserved names $reserved")
    val vals = df.select(keys.map(col) :+ col(valCol).cast("double").as("__v"): _*)
      .where(col("__v").isNotNull)
    val byV = vals.groupBy(keys.map(col) :+ col("__v"): _*)
      .agg(count(lit(1)).as("__c"))
    val wIn = Window.partitionBy(keys.map(col): _*).orderBy("__v")
      .rowsBetween(Window.unboundedPreceding, 0)
    val runs = byV.select(keys.map(col) :+ col("__v") :+
      (sum("__c").over(wIn)).as("__cum") :+
      (sum("__c").over(wIn) - col("__c")).as("__lo"): _*)
    val ns = vals.groupBy(keys.map(col): _*).agg(count(lit(1)).as("__n"))
    val h = col("q") * (col("__n").cast("double") - 1.0)
    val targets = ns
      .select(keys.map(col) :+ explode(array(qs.map(lit): _*)).as("q") :+
        col("__n"): _*)
      .select(keys.map(col) :+ col("q") :+
        (h - floor(h)).as("__frac") :+
        explode(array(
          struct(lit(0).as("w"), floor(h).cast("long").as("i")),
          struct(lit(1).as("w"), ceil(h).cast("long").as("i"))))
          .as("__t"): _*)
      .select(keys.map(col) :+ col("q") :+ col("__frac") :+
        col("__t.w").as("__w") :+ col("__t.i").as("__i"): _*)
    runs.join(targets, keys)
      .where(col("__i") >= col("__lo") && col("__i") < col("__cum"))
      .groupBy(keys.map(col) :+ col("q") :+ col("__frac"): _*)
      .agg(min(when(col("__w") === 0, col("__v"))).as("__v0"),
        min(when(col("__w") === 1, col("__v"))).as("__v1"))
      .select(keys.map(col) :+ col("q") :+
        round(col("__v0") + (col("__v1") - col("__v0")) * col("__frac"), 6)
          .as("val"): _*)
  }

  /** Population stability index between a reference and a current sample
    * of `valCol` — the standard drift monitor for model inputs/scores:
    * `PSI = Σ_bins (p_cur − p_ref)·ln(p_cur/p_ref)` over `nBins`
    * equal-width bins on [lo, hi) (values clamp into the edge bins, so
    * out-of-range mass is counted, not dropped). Laplace-smoothed shares
    * `p = (c + 1)/(n + nBins)` keep empty bins finite AND deterministic
    * (no epsilon clamp ordering games); per-bin terms round 6 dp and sum
    * as DECIMAL(18,6). Two map-side-combining aggregates (one per side),
    * a bin-frame join bounded by nBins. Rule of thumb: < 0.1 stable,
    * > 0.25 drifted. Output: one row (n_ref, n_cur, psi). */
  def psi(ref: DataFrame, cur: DataFrame, valCol: String,
      lo: Double, hi: Double, nBins: Int): DataFrame = {
    require(nBins >= 2, s"psi requires nBins >= 2, got $nBins")
    require(lo < hi, s"psi requires lo < hi, got [$lo, $hi)")
    def bins(df: DataFrame, cname: String) = {
      val b = least(greatest(
        floor((col(valCol).cast("double") - lo) / (hi - lo) * nBins)
          .cast("long"), lit(0L)), lit(nBins - 1L))
      df.where(col(valCol).isNotNull).select(b.as("__b"))
        .groupBy("__b").agg(count(lit(1)).as(cname))
    }
    val r = bins(ref, "__cr")
    val c = bins(cur, "__cc")
    val nr = r.agg(coalesce(sum("__cr"), lit(0L)).as("__nr"))
    val nc = c.agg(coalesce(sum("__cc"), lit(0L)).as("__nc"))
    val frame = nr.crossJoin(broadcast(nc))
      .select(col("__nr"), col("__nc"),
        explode(sequence(lit(0L), lit(nBins - 1L))).as("__b"))
    val p = (coalesce(col("__cr"), lit(0L)).cast("double") + 1.0) /
      (col("__nr").cast("double") + nBins)
    val q = (coalesce(col("__cc"), lit(0L)).cast("double") + 1.0) /
      (col("__nc").cast("double") + nBins)
    frame.join(broadcast(r), Seq("__b"), "left")
      .join(broadcast(c), Seq("__b"), "left")
      .select(col("__nr"), col("__nc"),
        round((q - p) * log(q / p), 6).cast(DecimalType(18, 6)).as("__x"))
      .groupBy("__nr", "__nc").agg(sum("__x").as("__psi"))
      .select(col("__nr").as("n_ref"), col("__nc").as("n_cur"),
        col("__psi").cast("double").as("psi"))
  }

  /** Lagged cross-correlation of two INTEGER-valued aligned series
    * (t, x, y): for each lag 0..maxLag, the Pearson correlation of
    * (x_t, y_{t+lag}) over the OBSERVED grid points present at both ends
    * (missing grid rows are skipped, not imputed — resample first for a
    * dense grid). The y side explodes by (maxLag+1) — a bounded
    * multiplier — and pairs form on a t equi-join; per-lag DECIMAL(38,0)
    * moments in one map-side-combining aggregate, closed form in double,
    * NULL under n < 2 or zero variance. Output: (lag, n, corr). */
  def lagCorrelation(df: DataFrame, tCol: String, xCol: String, yCol: String,
      maxLag: Int): DataFrame = {
    require(maxLag >= 0, s"lagCorrelation requires maxLag >= 0, got $maxLag")
    val a = df.select(col(tCol).cast("long").as("__t"),
      col(xCol).cast(dec).as("__x"))
    val b = df.select(col(tCol).cast("long").as("__ty"),
        col(yCol).cast(dec).as("__y"))
      .select(explode(sequence(lit(0L), lit(maxLag.toLong))).as("lag"),
        col("__ty"), col("__y"))
      .select(col("lag"), (col("__ty") - col("lag")).as("__t"), col("__y"))
    val m = a.join(b, "__t").groupBy("lag")
      .agg(count(lit(1)).cast(dec).as("__n"),
        sum(col("__x")).as("__sx"), sum(col("__y")).as("__sy"),
        sum(col("__x") * col("__y")).as("__sxy"),
        sum(col("__x") * col("__x")).as("__sxx"),
        sum(col("__y") * col("__y")).as("__syy"))
    val num = (col("__n") * col("__sxy") - col("__sx") * col("__sy"))
      .cast("double")
    val dxx = (col("__n") * col("__sxx") - col("__sx") * col("__sx"))
      .cast("double")
    val dyy = (col("__n") * col("__syy") - col("__sy") * col("__sy"))
      .cast("double")
    m.select(col("lag"), col("__n").cast("long").as("n"),
      when(dxx > 0.0 && dyy > 0.0 && col("__n") >= 2,
        round(num / sqrt(dxx * dyy), 6)).as("corr"))
  }

  /** 2-D Pareto frontier (skyline): the rows not dominated by any other —
    * minimize `minCol`, maximize `maxCol`; exact duplicates collapse to
    * the smallest id. Classic formulation is a running max over ONE
    * global sort — a one-task killer — so this runs the bucket-offset
    * pattern ([[Profiling.ksTest]]'s): per-bucket (⌊minCol⌋) maxima take
    * the one-task scan on the TINY bucket frame, the data only ever sees
    * a bucket-PARTITIONED window, and a row survives iff its `maxCol`
    * strictly exceeds every strictly-preceding row's (prior buckets via
    * the broadcast offset, same bucket via the partitioned running max).
    * Output: the frontier rows (idCol, minCol, maxCol). */
  def paretoFrontier2d(df: DataFrame, idCol: String, minCol: String,
      maxCol: String): DataFrame = {
    Seq("__p", "__s", "__bk", "__best", "__off", "__m").foreach(c =>
      require(!Seq(idCol, minCol, maxCol).contains(c),
        s"paretoFrontier2d reserves `$c`"))
    // `__s` keeps maxCol's NATIVE numeric type end-to-end (bucket maxima,
    // running max, dominance compare) — a long cast here would truncate
    // fractional maxima before the comparison and wrongly eliminate
    // non-dominated rows (e.g. max 1.2 vs 1.9 both truncating to 1).
    // "No prior row" is therefore a NULL running max (greatest() skips
    // nulls), not a Long.MinValue sentinel.
    val v = df.where(col(minCol).isNotNull && col(maxCol).isNotNull)
      .select(col(idCol), col(minCol), col(maxCol),
        col(minCol).cast("double").as("__p"),
        col(maxCol).as("__s"))
      .withColumn("__bk", floor(col("__p")).cast("long"))
    val bucketMax = v.groupBy("__bk").agg(max("__s").as("__m"))
    val wOff = Window.orderBy("__bk").rowsBetween(Window.unboundedPreceding, -1)
    val offs = bucketMax.select(col("__bk"),
      max("__m").over(wOff).as("__off"))
    val wIn = Window.partitionBy("__bk")
      .orderBy(col("__p"), col("__s").desc, col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val prevIn = max("__s").over(wIn)
    v.join(broadcast(offs), Seq("__bk"))
      .withColumn("__best", greatest(col("__off"), prevIn))
      .where(col("__best").isNull || col("__s") > col("__best"))
      .select(col(idCol), col(minCol), col(maxCol))
  }

  /** Retrieval ranking metrics — the evaluation side of the BM25/ANN
    * retrievers: per query, hit@k, MRR, and binary-relevance nDCG@k of a
    * ranked result table against a relevance ground-truth table.
    *
    *  - `results`: (qCol, dCol, rankCol) — rank 1-based; rows with
    *    rank > k are ignored.
    *  - `truth`: (qCol, dCol) — the relevant set per query (extra
    *    columns ignored; duplicates collapse).
    *
    * One row per DISTINCT results query: (qCol, n_rel, hit, mrr, ndcg).
    * `n_rel` counts the query's full relevant set; queries absent from
    * `truth` score 0/false. DCG uses gain 1/log2(r + 1) over the hit
    * ranks; IDCG places the min(k, n_rel) relevant docs at the top ranks.
    *
    * Determinism: each 1/log2(r+1) term rounds 6 dp BEFORE the rank-
    * sorted 0.0-seeded fold (the sub-ulp ln guard of the surprisal
    * family), and mrr/ndcg round 6 dp — every value engine-bit-exact.
    * Scale shape: one (q, d) equi-join of results against the (deduped)
    * truth, then per-query map-side-combining aggregates; nothing is
    * ever all-pairs and no global sort exists. */
  def rankingMetrics(results: DataFrame, truth: DataFrame, qCol: String,
      dCol: String, rankCol: String, k: Int): DataFrame = {
    require(k >= 1, s"rankingMetrics requires k >= 1, got $k")
    val res = results
      .select(col(qCol), col(dCol), col(rankCol).cast("long").as("__r"))
      .where(col("__r") >= 1 && col("__r") <= k)
    val rel = truth.select(col(qCol), col(dCol)).distinct()
    val nRel = rel.groupBy(col(qCol)).agg(count(lit(1)).as("n_rel"))
    val hits = res.join(rel, Seq(qCol, dCol), "left_semi")
      .groupBy(col(qCol))
      .agg(min(col("__r")).as("__first"),
        sort_array(collect_list(col("__r"))).as("__hr"))
    metricsFromHits(res, hits, nRel, qCol, k)
  }

  /** [[rankingMetrics]] for LABEL-DEFINED relevance (same-source /
    * same-topic weak labels — the standard retriever eval) WITHOUT the
    * (query × relevant-doc) pair frame: a popular label makes that frame
    * quadratic (64× corpus × 64× queries sharing a handful of sources grew
    * q190's truth 4096× — measured 56× wall), while here `n_rel` is a
    * label-keyed count joined back to the queries and hit-marking joins
    * only the top-k-bounded RESULT rows to the doc labels. Output is
    * IDENTICAL to `rankingMetrics(results, qLabels ⋈ dLabels on label)`
    * (pinned by q204 running q190's oracle verbatim) under the usual
    * weak-label shape: one label per query and per doc. */
  def rankingMetricsByLabel(results: DataFrame, qLabels: DataFrame,
      dLabels: DataFrame, qCol: String, dCol: String, rankCol: String,
      labelCol: String, k: Int): DataFrame = {
    require(k >= 1, s"rankingMetricsByLabel requires k >= 1, got $k")
    val res = results
      .select(col(qCol), col(dCol), col(rankCol).cast("long").as("__r"))
      .where(col("__r") >= 1 && col("__r") <= k)
    val ql = qLabels.select(col(qCol), col(labelCol).as("__ql")).distinct()
    val dl = dLabels.select(col(dCol), col(labelCol).as("__dl")).distinct()
    val nRel = ql.join(
        dl.groupBy(col("__dl")).agg(count(lit(1)).as("n_rel")),
        col("__ql") === col("__dl"), "left")
      .select(col(qCol), coalesce(col("n_rel"), lit(0L)).as("n_rel"))
    val hits = res.join(dl, Seq(dCol)).join(ql, Seq(qCol))
      .where(col("__dl") === col("__ql"))
      .groupBy(col(qCol))
      .agg(min(col("__r")).as("__first"),
        sort_array(collect_list(col("__r"))).as("__hr"))
    metricsFromHits(res, hits, nRel, qCol, k)
  }

  /** Shared metric projection of the two ranking-metric variants: per
    * query, hit@k / MRR / binary nDCG@k from the (first hit rank, hit
    * ranks, n_rel) frames. DCG gains round 6 dp before the rank-ordered
    * 0.0-seeded fold, so the metrics are engine-bit-exact. */
  private def metricsFromHits(res: DataFrame, hits: DataFrame,
      nRel: DataFrame, qCol: String, k: Int): DataFrame = {
    def gain(r: Column) = round(lit(1.0) / log2(r.cast("double") + 1.0), 6)
    res.select(col(qCol)).distinct()
      .join(hits, Seq(qCol), "left")
      .join(nRel, Seq(qCol), "left")
      .select(col(qCol),
        coalesce(col("n_rel"), lit(0L)).as("n_rel"),
        col("__first").isNotNull.as("hit"),
        round(when(col("__first").isNotNull,
          lit(1.0) / col("__first").cast("double")).otherwise(0.0), 6)
          .as("mrr"),
        round({
          val dcg = aggregate(
            transform(coalesce(col("__hr"), array().cast("array<long>")),
              r => gain(r)),
            lit(0.0), (acc, v) => acc + v)
          val ideal = least(coalesce(col("n_rel"), lit(0L)), lit(k.toLong))
          val idcg = aggregate(
            transform(sequence(lit(1L), ideal), i => gain(i)),
            lit(0.0), (acc, v) => acc + v)
          when(ideal > 0, dcg / idcg).otherwise(0.0)
        }, 6).as("ndcg"))
  }
}
