package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Event-sequence analytics over keyed, timestamped event streams: funnel
  * progression and gaps-and-islands run detection — the product-analytics
  * pair next to [[graft.operators.IntervalOps.sessionize]].
  */
object EventOps {

  /** Ordered funnel: for each key, the first time each stage fired GIVEN
    * the previous stage had already fired strictly earlier. Output: one row
    * per key that reached stage 1, with `t_<stage>` columns (NULL from the
    * first unreached stage on). The strict `>` ordering means a click at
    * the exact view instant does NOT advance the funnel — re-entrancy is
    * deliberately not modeled (first-touch attribution).
    *
    * Distributed shape at 100 TB: one filtered min-aggregate per stage
    * (map-side-combining, key-keyed) and stage-count equi-joins between
    * per-key AGGREGATES (key-cardinality-sized, not event-sized) — the
    * event stream is scanned once per stage with the stage filter pushed
    * into the scan, and never self-joined at event granularity. Stage
    * count is small and static (funnels are 3-7 steps), so the linear
    * join chain is bounded. */
  def funnel(df: DataFrame, keys: Seq[String], typeCol: String, tsCol: String,
      stages: Seq[String]): DataFrame = {
    require(stages.size >= 2, "funnel requires at least two stages")
    require(stages.distinct.size == stages.size, "duplicate funnel stages")
    val outNames = stages.map(s => s"t_$s")
    outNames.foreach(n => require(!df.columns.contains(n),
      s"funnel reserves output column `$n`"))
    val head = df.where(col(typeCol) === stages.head)
      .groupBy(keys.map(col): _*)
      .agg(min(col(tsCol)).as(outNames.head))
    stages.zip(outNames).sliding(2).foldLeft(head) {
      case (acc, Seq((_, prevOut), (stage, out))) =>
        val next = df.where(col(typeCol) === stage)
          .select(keys.map(col) :+ col(tsCol).as("__t"): _*)
          .join(acc.select(keys.map(col) :+ col(prevOut): _*), keys)
          .where(col("__t") > col(prevOut))
          .groupBy(keys.map(col): _*)
          .agg(min(col("__t")).as(out))
        acc.join(next.select(keys.map(col) :+ col(out): _*), keys, "left")
      case (acc, _) => acc
    }
  }

  /** Gaps-and-islands: maximal runs of CONSECUTIVE integer ids per key —
    * missing-sequence detection (dropped events, retention gaps, missing
    * file parts). One row per island: (keys..., run_start, run_end,
    * run_len), half-open NOT — run_end is inclusive (ids, not instants).
    *
    * The classic `id - row_number()` trick: within a key, consecutive ids
    * share the difference, so the group-by recovers each run without a
    * self-join. ONE key-keyed shuffle; the island group-by reuses the
    * window's partitioning. `idCol` values must be unique per key. */
  def islands(df: DataFrame, keys: Seq[String], idCol: String): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col("__id"))
    df.select(keys.map(col) :+ col(idCol).as("__id"): _*)
      .withColumn("__grp", col("__id") - row_number().over(w))
      .groupBy(keys.map(col) :+ col("__grp"): _*)
      .agg(min("__id").as("run_start"), max("__id").as("run_end"),
        count(lit(1)).as("run_len"))
      .drop("__grp")
  }

  /** Deterministic exponential moving average per key: the final EWMA of
    * each key's value sequence in (tsCol, tieCol) order, with smoothing
    * `alpha = 1 - 2^-kLog2` (e.g. kLog2=1 → alpha=0.5). Unrolled, the
    * recursion `y_i = alpha·x_i + (1-alpha)·y_{i-1}` is a weighted sum
    * whose weights are EXACT powers of two times the exactly-representable
    * alpha — so each term is two IEEE multiplications with one rounding
    * each, bit-identical in any engine, and the per-term
    * `floor(term·1e6)` fixed-point longs sum order-exactly (the
    * q100/q105 discipline; floats would re-associate differently per
    * partitioning). Exponents clamp at 400: 2^-400 underflows the 6 dp
    * fixed point for any realistic value, and the clamp keeps `pow` out
    * of the subnormal range where library rounding is least trustworthy.
    *
    * Shape: ONE key shuffle — the row_number window and the final
    * aggregate share the partitioning; nothing else moves. */
  def ewma(df: DataFrame, keys: Seq[String], tsCol: String, valCol: String,
      tieCol: String, kLog2: Int = 1): DataFrame = {
    require(kLog2 >= 1 && kLog2 <= 8, s"kLog2 must be in [1,8], got $kLog2")
    Seq("__i", "__n", "__fp").foreach { c =>
      require(!df.columns.contains(c), s"ewma: reserved column $c present") }
    val alpha = 1.0 - math.pow(2.0, -kLog2) // exact: 1 - 2^-k
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol), col(tieCol))
    val all = Window.partitionBy(keys.map(col): _*)
    val rows = df.select(keys.map(col) :+ col(tsCol) :+ col(tieCol) :+
        col(valCol).cast("double").as("__x"): _*)
      .withColumn("__i", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(all))
    // weight(i) = alpha · 2^(-k·(n-i)) for i>1;  2^(-k·(n-1)) for i==1
    val expo = least(lit(kLog2) * (col("__n") - col("__i")), lit(400))
    val term = when(col("__i") === 1,
        col("__x") * pow(lit(2.0), -expo))
      .otherwise(col("__x") * lit(alpha) * pow(lit(2.0), -expo))
    rows.withColumn("__fp", floor(term * lit(1e6)).cast("long"))
      .groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n_events"),
        (sum("__fp").cast("double") / 1e6).as("ewma"))
  }

  /** Kaplan–Meier survival curve over (duration, observed) rows — the
    * time-to-event summary (signup→purchase latency, churn, hardware
    * failure) with right-censoring done correctly: censored subjects
    * leave the at-risk set without counting as events. At each distinct
    * OBSERVED-event duration t:  n_t = #{duration ≥ t} (at risk),
    * d_t = events at t,  S(t) = Π_{t' ≤ t} (1 − d/n).
    *
    * Determinism: the product runs in log space — each factor's `ln`
    * rounds 6 dp (absorbing the cross-engine 1-ulp `ln`/`exp`
    * divergence, the q94 discipline), the cumulative sum runs over the
    * fixed ascending-t window order, and the final `exp` rounds 6 dp. A
    * time where d = n (everyone remaining fails) zeroes the curve from
    * there on explicitly — no ln(0) reaches either engine.
    *
    * Scale shape: rows collapse to per-duration (m, d) counts FIRST (one
    * map-side-combining aggregate); the at-risk reverse-cumulative and
    * the survival window then run over the distinct-duration frame —
    * value-domain-sized, tiny BY CONSTRUCTION (durations are bucketed
    * time units), the documented single-task window exception. Output:
    * (t, n_risk, d, surv) at observed-event times. */
  def survivalCurve(df: DataFrame, durCol: String, eventCol: String): DataFrame = {
    val d = df.select(col(durCol).cast("long").as("__t"),
      col(eventCol).cast("long").as("__e"))
    val byT = d.groupBy("__t")
      .agg(count(lit(1)).as("__m"), sum("__e").as("__d"))
    val wDesc = Window.orderBy(col("__t").desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val risk = byT.withColumn("__n", sum("__m").over(wDesc))
    val wAsc = Window.orderBy(col("__t"))
      .rowsBetween(Window.unboundedPreceding, 0)
    risk.where(col("__d") > 0)
      .withColumn("__lf",
        when(col("__d") < col("__n"),
          round(log(lit(1.0) - col("__d").cast("double") / col("__n")), 6))
          .otherwise(lit(0.0)))
      .withColumn("__z",
        sum(when(col("__d") === col("__n"), 1L).otherwise(0L)).over(wAsc))
      .select(col("__t").as("t"), col("__n").as("n_risk"), col("__d").as("d"),
        when(col("__z") > 0, lit(0.0))
          .otherwise(round(exp(sum("__lf").over(wAsc)), 6)).as("surv"))
  }

  /** Pairwise association rules over (basket, item) events — the
    * market-basket support/confidence/lift audit (Agrawal & Srikant,
    * VLDB '94 reduced to its pairwise core). A basket "contains" an item
    * if at least one such event exists; for every unordered item pair
    * x < y:  support = n_xy/N,  confidence = n_xy/n_x,
    * lift = n_xy·N / (n_x·n_y). All counts are exact longs; each ratio
    * is one IEEE division (or long-product division) rounded 6 dp.
    *
    * Scale shape: events collapse to DISTINCT (basket, item) FIRST —
    * the pair self-join runs on basket-sized item sets (bounded by the
    * item vocabulary), never on raw events; item counts and the
    * single-row N broadcast back into the pair aggregate. */
  def associationPairs(df: DataFrame, basketCol: String, itemCol: String): DataFrame = {
    val bi = df.select(col(basketCol).as("__bk"), col(itemCol).as("__it"))
      .distinct()
    val nBaskets = bi.agg(countDistinct(col("__bk")).as("__nb"))
    val itemCounts = bi.groupBy(col("__it")).agg(count(lit(1)).as("__ni"))
    val pairs = bi.as("l")
      .join(bi.as("r"), col("l.__bk") === col("r.__bk") &&
        col("l.__it") < col("r.__it"))
      .groupBy(col("l.__it").as("x"), col("r.__it").as("y"))
      .agg(count(lit(1)).as("n_xy"))
    pairs
      .join(broadcast(itemCounts.select(col("__it").as("x"),
        col("__ni").as("n_x"))), "x")
      .join(broadcast(itemCounts.select(col("__it").as("y"),
        col("__ni").as("n_y"))), "y")
      .crossJoin(broadcast(nBaskets))
      .select(col("x"), col("y"), col("n_x"), col("n_y"), col("n_xy"),
        round(col("n_xy") / col("__nb"), 6).as("support"),
        round(col("n_xy") / col("n_x"), 6).as("confidence"),
        round((col("n_xy") * col("__nb")) / (col("n_x") * col("n_y")), 6)
          .as("lift"))
  }

  /** Item–item co-occurrence similarity over binary basket incidence —
    * the recommender / "covered-together" rollup next to
    * [[associationPairs]]'s rule mining: for every item pair sharing >=
    * `minSupport` baskets, cosine = n_ab/√(n_a·n_b), jaccard =
    * n_ab/(n_a+n_b−n_ab), lift = n_ab·N/(n_a·n_b). Same scale shape:
    * DISTINCT (basket, item) first, so the pair self-join explodes only
    * within-basket combinations (bounded by basket width — C(7,2) on
    * TPC-H orders), map-side-combining into (a, b) counts; per-item
    * counts join back keyed on the pair frame; the single-row basket
    * total broadcasts. √ of an exact integer product is IEEE-exact on
    * any engine; each ratio rounds 6 dp. */
  def cooccurrence(df: DataFrame, basketCol: String, itemCol: String,
      minSupport: Long = 2L): DataFrame = {
    require(minSupport >= 1, s"minSupport must be >= 1: $minSupport")
    // the distinct (basket, item) incidence feeds THREE consumers (basket
    // count, item counts, pair explode) — materialize it once; exchange
    // reuse does not bridge their differently-keyed downstream aggregates
    // (q139's finding, same shape)
    val bi = df.select(col(basketCol).as("__bk"), col(itemCol).as("__it"))
      .distinct().localCheckpoint(true)
    val nBaskets = bi.agg(countDistinct(col("__bk")).as("__nb"))
    val itemCounts = bi.groupBy(col("__it")).agg(count(lit(1)).as("__ni"))
    // pairs explode IN-ARRAY from the per-basket sorted item list (strictly
    // increasing after the distinct, so a < b falls out) — ONE basket-keyed
    // shuffle instead of a basket self-join that ships the incidence frame
    // twice; bounded by basket width like the join was (a pathological
    // mega-basket is quadratic either way). The outer sequence runs to
    // size so the inner slice length stays >= 0 (Spark's sequence(1, 0)
    // counts DOWN — never generate it).
    val pairs = bi.groupBy("__bk")
      .agg(sort_array(collect_list(col("__it"))).as("__is"))
      .select(explode(expr(
        "flatten(transform(sequence(1, size(__is)), " +
          "i -> transform(slice(__is, i + 1, size(__is) - i), " +
          "y -> struct(element_at(__is, i) AS item_a, y AS item_b))))"))
        .as("__p"))
      .groupBy(col("__p.item_a").as("item_a"), col("__p.item_b").as("item_b"))
      .agg(count(lit(1)).as("n_ab"))
      .where(col("n_ab") >= minSupport)
    pairs
      .join(itemCounts.select(col("__it").as("item_a"), col("__ni").as("n_a")),
        "item_a")
      .join(itemCounts.select(col("__it").as("item_b"), col("__ni").as("n_b")),
        "item_b")
      .crossJoin(broadcast(nBaskets))
      .select(col("item_a"), col("item_b"), col("n_a"), col("n_b"), col("n_ab"),
        round(col("n_ab") / sqrt((col("n_a") * col("n_b")).cast("double")), 6)
          .as("cosine"),
        round(col("n_ab") / (col("n_a") + col("n_b") - col("n_ab")), 6)
          .as("jaccard"),
        round((col("n_ab") * col("__nb")) / (col("n_a") * col("n_b")), 6)
          .as("lift"))
  }

  /** Multi-touch attribution over a keyed event stream: for each
    * CONVERSION event, every TOUCH event by the same key inside the
    * lookback window `[convTs − lookback, convTs)` (in the timestamp
    * column's unit) earns credit under
    * `model`:
    *
    *  - `"linear"`:   1/n to each of the conversion's n touches;
    *  - `"position"`: U-shaped — 0.4 to the first touch, 0.4 to the last,
    *                  0.2/(n−2) to each middle one (n=1 → 1.0, n=2 →
    *                  0.5/0.5) — the standard position-based model.
    *
    * Every credit rounds at 6 dp and the per-channel totals sum as
    * DECIMAL(18,6) — order-exact. Touch order inside a window is
    * (ts, tieCol) — a total order, so first/last are well-defined and any
    * engine replays them. Output: one row per channel (touch type) that
    * earned credit: (channel, n_touches, n_conversions, credit).
    *
    * Shape at 100 TB: the touch↔conversion pairing is a per-key equi-join
    * (key-partitioned shuffle, AQE-splittable skew) with the window
    * predicate as the join residual; per-conversion counts/positions are
    * windows over (key, conversion id) — data-sized frames only ever see
    * PARTITIONED windows; the channel rollup is a map-side-combining
    * aggregate over a touch-type-bounded frame. */
  def attribution(df: DataFrame, keys: Seq[String], typeCol: String,
      tsCol: String, tieCol: String, touchTypes: Seq[String],
      convType: String, lookback: Long, model: String): DataFrame = {
    require(lookback > 0, s"attribution requires lookback > 0, got $lookback")
    require(Seq("linear", "position").contains(model),
      s"unknown attribution model `$model` (expected linear or position)")
    require(touchTypes.nonEmpty && !touchTypes.contains(convType),
      "touchTypes must be non-empty and must not contain convType")
    val touches = df.where(col(typeCol).isin(touchTypes: _*))
      .select(keys.map(col) :+ col(typeCol).as("__channel") :+
        col(tsCol).as("__tt") :+ col(tieCol).as("__tie"): _*)
    val convs = df.where(col(typeCol) === convType)
      .select(keys.map(col) :+ col(tsCol).as("__ct") :+
        col(tieCol).as("__cid"): _*)
    val paired = touches.join(convs, keys)
      .where(col("__tt") >= col("__ct") - lookback && col("__tt") < col("__ct"))
    val w = Window.partitionBy((keys :+ "__cid").map(col): _*)
      .orderBy(col("__tt"), col("__tie"))
    val positioned = paired
      .withColumn("__pos", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(
        Window.partitionBy((keys :+ "__cid").map(col): _*)))
    val nD = col("__n").cast("double")
    val credit = model match {
      case "linear" => round(lit(1.0) / nD, 6)
      case "position" => round(
        when(col("__n") === 1, 1.0)
          .when(col("__n") === 2, 0.5)
          .when(col("__pos") === 1 || col("__pos") === col("__n"), 0.4)
          .otherwise(lit(0.2) / (nD - 2.0)), 6)
    }
    positioned
      .select(keys.map(col) :+ col("__channel") :+ col("__cid") :+
        credit.cast(DecimalType(18, 6)).as("__credit"): _*)
      .groupBy("__channel")
      .agg(count(lit(1)).as("n_touches"),
        // conversions are identified by (keys, tie) — tieCol need only be
        // unique per key, not corpus-wide
        countDistinct(struct((keys :+ "__cid").map(col): _*))
          .as("n_conversions"),
        sum("__credit").cast("double").as("credit"))
      .withColumnRenamed("__channel", "channel")
  }

  /** Top-k most frequent event-type sequences of length `n` (sliding
    * windows over each key's (ts, tie)-ordered stream — the sequential
    * pattern mining staple). The window is PARTITIONED by key; sequence
    * counting is a map-side-combining aggregate over a type-vocab-bounded
    * frame (<= |types|^n distinct sequences), where the final rank runs.
    * Sequences render as "a>b>c" (types must not contain '>').
    * Output: (seq, cnt, rank), rank <= k by (cnt desc, seq). */
  def topSequences(df: DataFrame, keys: Seq[String], typeCol: String,
      tsCol: String, tieCol: String, n: Int, k: Int): DataFrame = {
    require(n >= 2, s"topSequences requires n >= 2, got $n")
    require(k >= 1, s"topSequences requires k >= 1, got $k")
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol), col(tieCol))
    val leads = (1 until n).map(i => lead(col(typeCol), i).over(w))
    // the head type needs the same null guard as the leads: concat_ws
    // SKIPS nulls, so an unguarded NULL head would emit a malformed
    // (n-1)-element sequence ("b>c") instead of dropping the window —
    // SQL's || propagates the NULL and drops it
    val full = when((col(typeCol) +: leads).map(_.isNotNull).reduce(_ && _),
      concat_ws(">", col(typeCol) +: leads: _*))
    val counts = df.select(full.as("seq")).where(col("seq").isNotNull)
      .groupBy("seq").agg(count(lit(1)).as("cnt"))
    val rw = Window.orderBy(col("cnt").desc, col("seq"))
    counts.withColumn("rank", row_number().over(rw).cast("long"))
      .where(col("rank") <= k)
  }

  /** Trailing-window rate anomaly: per (key, tick) event counts scored
    * against the TRAILING `window` ticks (exclusive of the current one) —
    * the ops-floor "is this hour weird for this event type" monitor.
    * z = (x − mean)/std over the trailing frame, NULL when fewer than
    * `minPoints` trailing ticks exist or the trailing variance is zero.
    * Counts are exact integers; the trailing sums run over a fixed ROWS
    * frame of a key-PARTITIONED window (deterministic integer adds), and
    * the z closed form runs in double, rounded 6 dp. ONE key shuffle
    * shared by the count aggregate and the windows. Output:
    * (keys..., tick, x, n_trail, z). */
  def rateAnomaly(df: DataFrame, keys: Seq[String], tickCol: String,
      window: Int, minPoints: Int): DataFrame = {
    require(window >= 2, s"rateAnomaly requires window >= 2, got $window")
    require(minPoints >= 2 && minPoints <= window,
      s"minPoints must be in [2, window]: $minPoints")
    Seq("tick", "x", "n_trail", "z").foreach(c => require(!keys.contains(c),
      s"rateAnomaly reserves output column `$c`"))
    val counts = df.groupBy(keys.map(col) :+ col(tickCol).as("tick"): _*)
      .agg(count(lit(1)).as("x"))
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col("tick"))
      .rowsBetween(-window, -1)
    val s = sum("x").over(w)
    val q = sum(col("x") * col("x")).over(w)
    val n = count(lit(1)).over(w)
    val nD = n.cast("double")
    val mean = s.cast("double") / nD
    val varT = (nD * q.cast("double") - s.cast("double") * s.cast("double")) /
      (nD * (nD - 1.0))
    // the divisions stay INSIDE the when-guard (ANSI mode raises on a
    // double divide-by-zero; minPoints >= 2 makes both denominators
    // nonzero on the taken branch, and when() evaluates branches lazily)
    val z = when(n >= minPoints,
      when(varT > 0.0, round((col("x").cast("double") - mean) / sqrt(varT), 6)))
    counts.select(keys.map(col) :+ col("tick") :+ col("x") :+
      n.as("n_trail") :+ z.as("z"): _*)
  }

  /** Integer-exact CUSUM drift alarms per key (Page 1954): over the
    * tick-ordered counts x_t,  C_t = max(0, C_{t-1} + (x_t − μ) − K)
    * with slack K and alarm threshold H given as PERCENT OF THE MEAN —
    * everything scaled by 100·n so the fold is pure long arithmetic
    * (C_scaled = 100·n·C): d_t = 100(x_t·n − Σ) − pctSlack·Σ, alarm when
    * C > pctThreshold·Σ. The per-key tick series is value-domain bounded
    * (ticks are bucketed time), so the sorted fold is the library's
    * bounded-sequential pattern (q59/EWMA/survival) — state never leaves
    * the executor, and the fold is exact under any partitioning. Output:
    * one row per key (keys..., n_ticks, n_alarms, max_cusum,
    * first_alarm_tick NULL when no alarm). `max_cusum` stays in the
    * 100·n·count scale (divide by 100·n for count units). Counts must
    * keep 100·x·n within long range — coarsen ticks for extreme keys. */
  def cusumAlarms(df: DataFrame, keys: Seq[String], tickCol: String,
      pctSlack: Int, pctThreshold: Int): DataFrame = {
    require(pctSlack >= 0, s"pctSlack must be >= 0: $pctSlack")
    require(pctThreshold > 0, s"pctThreshold must be > 0: $pctThreshold")
    val counts = df.groupBy(keys.map(col) :+ col(tickCol).cast("long").as("t"): _*)
      .agg(count(lit(1)).as("x"))
    val perKey = counts.groupBy(keys.map(col): _*)
      .agg(sum("x").as("__sum"), count(lit(1)).as("__n"),
        sort_array(collect_list(struct(col("t"), col("x")))).as("__xs"))
    val cus = s"greatest(0L, element_at(a, 1) + " +
      s"(100L * (element_at(e, 2) * __n - __sum) - ${pctSlack}L * __sum))"
    val alarm = s"$cus > ${pctThreshold}L * __sum"
    val fold = s"""aggregate(
      transform(__xs, p -> array(p.t, p.x)),
      array(0L, 0L, 0L, -1L),
      (a, e) -> array(
        $cus,
        element_at(a, 2) + IF($alarm, 1L, 0L),
        greatest(element_at(a, 3), $cus),
        IF(element_at(a, 4) = -1L AND $alarm, element_at(e, 1),
           element_at(a, 4))))"""
    perKey.withColumn("__acc", expr(fold))
      .select(keys.map(col) :+ size(col("__xs")).cast("long").as("n_ticks") :+
        expr("element_at(__acc, 2)").as("n_alarms") :+
        expr("element_at(__acc, 3)").as("max_cusum") :+
        expr("nullif(element_at(__acc, 4), -1L)").as("first_alarm_tick"): _*)
  }
}
