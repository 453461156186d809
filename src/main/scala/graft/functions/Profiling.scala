package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
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

  /** Data-quality expectation suite — the assertion layer next to
    * [[profile]]: evaluate row-level rules (each a boolean Column over one
    * row) and key-uniqueness rules in ONE aggregate over ONE scan, and
    * report per rule `(rule, n_rows, violations, passed)`. A NULL rule
    * evaluation counts as a violation (an expectation that cannot be
    * established is not met). Uniqueness violations = rows beyond the
    * first per key combination (`n_rows - distinct key tuples`; NULLs
    * group as values via the struct wrap).
    *
    * Distributed shape at 100 TB: row rules are codegen'd
    * `sum(CASE WHEN ..)` partials — map-side-combined, one row shipped per
    * partition; each uniqueness rule adds one exact `count(DISTINCT
    * struct(keys))` stream through Expand (the documented price of
    * exactness — [[Sketches.hllSketch]] per key set is the estimate path
    * when an approximate check suffices). */
  def expectations(df: DataFrame, rowRules: Seq[(String, org.apache.spark.sql.Column)],
      uniqueRules: Seq[(String, Seq[String])] = Nil): DataFrame = {
    require(rowRules.nonEmpty || uniqueRules.nonEmpty, "no expectations given")
    val names = rowRules.map(_._1) ++ uniqueRules.map(_._1)
    require(names.distinct.size == names.size, "duplicate rule names")
    uniqueRules.foreach { case (r, ks) =>
      val missing = ks.filterNot(df.columns.contains)
      require(missing.isEmpty, s"rule `$r`: no such column(s): ${missing.mkString(", ")}")
    }
    val rowAggs = rowRules.map { case (name, pred) =>
      sum(when(coalesce(pred, lit(false)), 0L).otherwise(1L)).as(s"__v_$name")
    }
    val uniqAggs = uniqueRules.map { case (name, ks) =>
      countDistinct(struct(ks.map(col): _*)).as(s"__u_$name")
    }
    df.agg(count(lit(1)).as("__n"), (rowAggs ++ uniqAggs): _*)
      .select(explode(array(
        rowRules.map { case (name, _) =>
          struct(lit(name).as("rule"), col("__n").as("n_rows"),
            coalesce(col(s"__v_$name"), lit(0L)).as("violations"))
        } ++ uniqueRules.map { case (name, _) =>
          struct(lit(name).as("rule"), col("__n").as("n_rows"),
            (col("__n") - col(s"__u_$name")).as("violations"))
        }: _*)).as("r"))
      .select(col("r.rule").as("rule"), col("r.n_rows").as("n_rows"),
        col("r.violations").as("violations"),
        (col("r.violations") === 0L).as("passed"))
  }

  /** Exact Pearson correlation per group over INTEGER-scaled inputs — the
    * deterministic replacement for `corr()`: Spark's built-in accumulates
    * doubles whose merge order varies run to run, so its last ulp is not
    * reproducible, and the driver's bit-pattern gate (or any two engines)
    * can disagree. Here the five moment sums (Σx, Σy, Σxy, Σx², Σy², n)
    * accumulate as DECIMAL(38,0) — exact in any order — and only the final
    * closed form runs in floating point: every engine converts the same
    * exact integers and evaluates the same IEEE expression (sqrt is
    * correctly rounded by IEEE-754, unlike ln — no rounding guard needed).
    * Output: (keys..., n, corr) with corr at 6 dp, NULL when either
    * variance is zero. One map-side-combining aggregate. */
  /** Benford first-digit audit — the classic fabricated-numbers /
    * truncation-artifact detector: the leading digit of the fixed-point
    * integer `⌊|v|·scale⌋` (first-digit extraction via INTEGER-to-string,
    * exact and identical on any engine — never via log10, whose 1-ulp
    * wobble at powers of ten flips the digit) against the Benford
    * expectation p_d = log10(1+1/d). One aggregate + the 9-row digit
    * frame joined back (absent digits surface as zero counts, they're the
    * signal); each χ² term rounds 6 dp PER DIGIT — no cross-row double
    * sum, so the result is order-exact. Output: (digit, n_d, obs_frac,
    * benford_p, chi2_term). */
  def benfordAudit(df: DataFrame, valCol: String, scale: Long = 1000L): DataFrame = {
    require(scale >= 1, s"scale must be >= 1: $scale")
    val m = floor(abs(col(valCol)) * scale).cast("long")
    val counts = df.select(m.as("__m")).where(col("__m") > 0)
      .select(substring(col("__m").cast("string"), 1, 1).cast("int").as("digit"))
      .groupBy("digit").agg(count(lit(1)).as("__nd"))
    val total = counts.agg(sum("__nd").as("__n"))
    val digits = (1 to 9).map { d =>
      struct(lit(d).as("digit"), lit(math.log10(1.0 + 1.0 / d)).as("__p"))
    }
    val frame = total.select(col("__n"), explode(array(digits: _*)).as("__d"))
      .select(col("__n"), col("__d.digit").as("digit"), col("__d.__p").as("__p"))
    val nd = coalesce(col("__nd"), lit(0L))
    frame.join(counts, Seq("digit"), "left")
      .select(col("digit"), nd.as("n_d"),
        round(nd / col("__n"), 6).as("obs_frac"),
        round(col("__p"), 6).as("benford_p"),
        round((nd - col("__n") * col("__p")) * (nd - col("__n") * col("__p")) /
          (col("__n") * col("__p")), 6).as("chi2_term"))
  }

  def exactCorr(df: DataFrame, keys: Seq[String], xCol: String,
      yCol: String): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val x = col(xCol).cast(dec)
    val y = col(yCol).cast(dec)
    val agged = df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).cast(dec).as("__n"),
        sum(x).as("__sx"), sum(y).as("__sy"),
        sum(x * y).as("__sxy"), sum(x * x).as("__sxx"), sum(y * y).as("__syy"))
    val num = (col("__n") * col("__sxy") - col("__sx") * col("__sy")).cast("double")
    val dxx = (col("__n") * col("__sxx") - col("__sx") * col("__sx")).cast("double")
    val dyy = (col("__n") * col("__syy") - col("__sy") * col("__sy")).cast("double")
    agged.select(keys.map(col) :+ col("__n").cast("long").as("n") :+
      when(dxx > 0.0 && dyy > 0.0,
        round(num / (sqrt(dxx) * sqrt(dyy)), 6)).as("corr"): _*)
  }

  /** Apply a CDC delta to a keyed snapshot — the WRITE half of dataset
    * versioning next to [[diffSnapshots]]: `delta` carries `opCol`
    * (`"upsert"` inserts-or-replaces the key's row, `"delete"` removes
    * it); every other base row carries over. One anti-join (base minus
    * touched keys) + the upsert rows appended — the base never shuffles
    * more than the key anti-join requires, and the delta is the small side
    * at 100 TB (broadcastable). Delta keys must be unique; unknown ops are
    * rejected at plan time via a codegen'd guard. */
  def applyDelta(base: DataFrame, delta: DataFrame, keyCol: String,
      opCol: String): DataFrame = {
    val cols = base.columns.toSeq
    require(delta.columns.contains(opCol), s"delta lacks op column `$opCol`")
    cols.foreach(c => require(delta.columns.contains(c),
      s"delta lacks base column `$c`"))
    val checked = delta.withColumn(opCol,
      when(col(opCol).isin("upsert", "delete"), col(opCol))
        .otherwise(raise_error(concat(lit("applyDelta: unknown op "), col(opCol)))))
    val touched = checked.select(col(keyCol))
    base.join(touched, Seq(keyCol), "left_anti")
      .unionByName(checked.where(col(opCol) === "upsert").select(cols.map(col): _*))
  }

  /** SCD Type-2 dimension build from an append-only change log — the other
    * half of dataset versioning next to [[diffSnapshots]]: each key's
    * attribute history becomes half-open validity intervals
    * `[valid_from, valid_to)` with `valid_to` NULL on the current row.
    * Consecutive log rows repeating the same attribute values collapse into
    * one validity run (null-safe compare), so re-delivered unchanged records
    * never fragment the dimension.
    *
    * Input: one row per observation `(key, ordCols..., attrCols...)`;
    * `ordCols` must totally order each key's log (pass a tiebreaker column —
    * an offset/sequence id — after the event time; with ties left
    * undetermined the collapse itself is nondeterministic). Distributed
    * shape: ONE key-keyed shuffle; both window passes and the filter run in
    * that partitioning, no second Exchange. Validity endpoints are whatever
    * integer unit `ordCols.head` carries — exact, no float arithmetic. */
  def scd2(log: DataFrame, keyCol: String, ordCols: Seq[String],
      attrCols: Seq[String]): DataFrame = {
    require(ordCols.nonEmpty, "scd2 requires at least one ordering column")
    require(attrCols.nonEmpty, "scd2 requires at least one attribute column")
    Seq("valid_from", "valid_to", "is_current").foreach(r =>
      require(!log.columns.contains(r), s"scd2 reserves output column `$r`"))
    val w = Window.partitionBy(keyCol).orderBy(ordCols.map(col): _*)
    // row_number==1 (not lag(attr) IS NULL) marks the first observation:
    // a genuinely-NULL first attribute value is null-safe-equal to the
    // missing predecessor and would otherwise be dropped
    val changed = attrCols
      .map(c => !(col(c) <=> lag(col(c), 1).over(w))).reduce(_ || _) ||
      row_number().over(w) === 1
    val points = log
      .withColumn("__chg", changed)
      .where(col("__chg"))
      .drop("__chg")
    val w2 = Window.partitionBy(keyCol).orderBy(ordCols.map(col): _*)
    points.select(
      col(keyCol) +: attrCols.map(col) :+
        col(ordCols.head).as("valid_from") :+
        lead(col(ordCols.head), 1).over(w2).as("valid_to"): _*)
      .withColumn("is_current", col("valid_to").isNull)
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

  /** Robust per-group outlier detection via median/MAD — the
    * distribution-free anomaly screen (a mean/stddev z-score is itself
    * dragged by the outliers it hunts). Per group: exact interpolated
    * median, MAD = median(|x - med|), robust z = (x - med) /
    * (1.4826·MAD); rows with |z| > `zCut` surface. Median and MAD round
    * 6 dp before any downstream arithmetic (both engines agree on the
    * rounded value even when interpolation differs in the last ulp —
    * the q89 discipline), z rounds 4 dp before the cut so no boundary
    * row can flip. Zero-MAD groups (a majority-constant column) emit no
    * outliers rather than dividing by zero.
    *
    * Shape: two exact-percentile aggregate passes (each buffers a
    * group's values in one task BY CHOICE — the oracle needs exactness;
    * approx_percentile is the sketch path at the far end) whose tiny
    * per-group results broadcast back into the row stream; the data
    * itself shuffles only by the group key. */
  /** Exact two-sample Kolmogorov–Smirnov statistic between the `valCol`
    * distributions of groups `groupA` and `groupB` (of `groupCol`):
    * D = max_v |F_A(v) − F_B(v)|, the standard distribution-drift test
    * between two slices. PURE INTEGER until the final division: per
    * distinct value the running counts (c_A, c_B) cross-multiply against
    * the opposite sample size, so `d_num = max |c_A·n_B − c_B·n_A|` is
    * exact in any engine, and `ks = d_num / (n_A·n_B)` is one rounded
    * IEEE division.
    *
    * Scale shape: the value stream collapses to DISTINCT values first
    * (one map-side-combining aggregate); the running sums then use the
    * bucket-offset pattern (fixed ⌊v⌋ buckets: per-bucket totals are a
    * tiny frame whose offsets broadcast back, within-bucket windows
    * partition by bucket) — never a one-task global window over the
    * data. Output: one row (n_a, n_b, d_num, ks). */
  def ksTest(df: DataFrame, groupCol: String, valCol: String,
      groupA: String, groupB: String): DataFrame = {
    val pts = df.where(col(groupCol).isin(groupA, groupB))
      .select(col(valCol).cast("double").as("__v"),
        when(col(groupCol) === groupA, 1L).otherwise(0L).as("__a"),
        when(col(groupCol) === groupB, 1L).otherwise(0L).as("__b"))
    val byVal = pts.groupBy("__v")
      .agg(sum("__a").as("__ca"), sum("__b").as("__cb"))
      .withColumn("__bk", floor(col("__v")).cast("long"))
    // bucket offsets: the per-bucket totals frame is bucket-domain-sized
    // (tiny); its exclusive running sum may run in one task by design
    val bucketTotals = byVal.groupBy("__bk")
      .agg(sum("__ca").as("__ta"), sum("__cb").as("__tb"))
    val wOff = Window.orderBy("__bk")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = bucketTotals.select(col("__bk"),
      coalesce(sum("__ta").over(wOff), lit(0L)).as("__oa"),
      coalesce(sum("__tb").over(wOff), lit(0L)).as("__ob"))
    val wIn = Window.partitionBy("__bk").orderBy("__v")
      .rowsBetween(Window.unboundedPreceding, 0)
    val runs = byVal.join(broadcast(offs), "__bk")
      .select(
        (col("__oa") + sum("__ca").over(wIn)).as("__ra"),
        (col("__ob") + sum("__cb").over(wIn)).as("__rb"))
    val n = pts.agg(sum("__a").as("n_a"), sum("__b").as("n_b"))
    runs.crossJoin(broadcast(n))
      .groupBy("n_a", "n_b")
      .agg(max(abs(col("__ra") * col("n_b") - col("__rb") * col("n_a")))
        .as("d_num"))
      .select(col("n_a"), col("n_b"), col("d_num"),
        round(col("d_num") / (col("n_a") * col("n_b")), 6).as("ks"))
  }

  /** Per-group winsorized mean: values clip to the exact interpolated
    * [pLo, pHi] percentiles (rounded 6 dp — the q89 discipline) before
    * averaging, so a fat tail moves the mean by at most the clip bound —
    * the robust location estimate next to [[robustOutliers]]'s detection.
    * The mean itself is FIXED-POINT (`floor(clip·1e6)` longs summed
    * order-exactly, one division + round at the end). One percentile
    * aggregate broadcast back, one group aggregate; the data shuffles
    * once by the group key. Output: (keys…, n, p_lo, p_hi, wmean). */
  def winsorizedMean(df: DataFrame, keys: Seq[String], valCol: String,
      pLo: Double = 0.05, pHi: Double = 0.95): DataFrame = {
    require(pLo >= 0 && pHi <= 1 && pLo < pHi, s"bad clip range [$pLo, $pHi]")
    Seq("__plo", "__phi").foreach { c =>
      require(!df.columns.contains(c),
        s"winsorizedMean: reserved column $c present") }
    val v = col(valCol).cast("double")
    val pcts = df.groupBy(keys.map(col): _*)
      .agg(round(expr(s"percentile($valCol, $pLo)"), 6).as("__plo"),
        round(expr(s"percentile($valCol, $pHi)"), 6).as("__phi"))
    val clip = least(greatest(v, col("__plo")), col("__phi"))
    df.join(broadcast(pcts), keys)
      .withColumn("__fp", floor(clip * lit(1e6)).cast("long"))
      .groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n"), min("__plo").as("p_lo"),
        min("__phi").as("p_hi"),
        round((sum("__fp").cast("double") / 1e6) / count(lit(1)), 6)
          .as("wmean"))
  }

  def robustOutliers(df: DataFrame, keys: Seq[String], valCol: String,
      zCut: Double = 3.0): DataFrame = {
    Seq("__med", "__mad", "z").foreach { c =>
      require(!df.columns.contains(c),
        s"robustOutliers: reserved column $c present") }
    val v = col(valCol).cast("double")
    val med = df.groupBy(keys.map(col): _*)
      .agg(round(expr(s"percentile($valCol, 0.5)"), 6).as("__med"))
    val withMed = df.join(broadcast(med), keys)
    val mad = withMed
      .withColumn("__dev", abs(v - col("__med")))
      .groupBy(keys.map(col): _*)
      .agg(round(expr("percentile(__dev, 0.5)"), 6).as("__mad"))
    withMed.join(broadcast(mad), keys)
      .where(col("__mad") > 0)
      .withColumn("z", round((v - col("__med")) / (lit(1.4826) * col("__mad")), 4))
      .where(abs(col("z")) > lit(zCut))
      .drop("__med", "__mad")
  }

  /** k-anonymity audit over quasi-identifier columns: every row should be
    * hidden in a group of at least `k` rows sharing its QI tuple (Sweeney
    * 2002) — the privacy pre-flight before releasing or training on
    * quasi-identified data. ONE QI-keyed aggregate, then a single-row
    * rollup: total rows, distinct QI groups, the smallest group (the
    * dataset's actual anonymity level), violating groups (< k), and the
    * fraction of rows at risk. NULL QI values form their own groups (they
    * are identifying in practice). Output: one row
    * (n_rows, n_groups, k_min, n_violating, frac_at_risk). */
  def kAnonymity(df: DataFrame, qiCols: Seq[String], k: Long): DataFrame = {
    require(qiCols.nonEmpty, "kAnonymity requires at least one QI column")
    require(k >= 2, s"kAnonymity requires k >= 2, got $k")
    val g = df.groupBy(qiCols.map(col): _*).agg(count(lit(1)).as("__c"))
    g.agg(sum("__c").as("__nr"), count(lit(1)).as("n_groups"),
        min("__c").as("k_min"),
        sum(when(col("__c") < k, 1L).otherwise(0L)).as("n_violating"),
        sum(when(col("__c") < k, col("__c")).otherwise(0L)).as("__risk"))
      .select(col("__nr").as("n_rows"), col("n_groups"), col("k_min"),
        col("n_violating"),
        round(col("__risk").cast("double") / col("__nr").cast("double"), 6)
          .as("frac_at_risk"))
  }
}
