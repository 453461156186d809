package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.intervals.IntervalCols
import graft.operators.{GroupedIntervalJoin, IntervalJoin, QuantileWindows}
import graft.operators.IntervalJoin.{Options, Strategy}
import graft.operators.GroupedIntervalJoin.Selector

/** Driver contract — one `queries` entry per implemented operator
  * (SURVEY.md §2), with DuckDB-oracle SQL for each (SURVEY §2.3).
  *
  * Interval convention: canonical `struct<start,stop>` long nanoseconds,
  * half-open. `events.ts` is Parquet TIMESTAMP(NANOS) and is read as long ns
  * via `spark.sql.legacy.parquet.nanosAsLong` (set by every session builder
  * here and defensively at query time); the DuckDB side uses `epoch_ns`.
  * Timestamp-ms columns (orders/lineitem) go through `unix_micros × 1000` /
  * `epoch_us × 1000`. All oracle comparisons are order-insensitive; every
  * aggregate/computed column carries the same alias on both sides.
  */
object SparkEntry {

  // ---------------------------------------------------------------- helpers

  private def s(session: SparkSession): SparkSession = {
    // legacy conf is runtime-settable; harmless if already set by the builder
    try session.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    catch { case _: Throwable => () }
    session
  }

  private def table(spark: SparkSession, dir: String, name: String): DataFrame =
    s(spark).read.parquet(s"$dir/$name.parquet")

  /** Interval fixture: per user, consecutive event timestamps become
    * half-open spans (FIXTURES.md `event_spans`). */
  private def eventSpans(spark: SparkSession, dir: String): DataFrame = {
    val ev = table(spark, dir, "events")
      // DuckDB (the oracle) reads Parquet TIMESTAMP(NANOS) at µs precision;
      // truncate to µs boundaries so both engines see identical longs.
      .withColumn("tsq", expr("(ts div 1000) * 1000"))
    val w = Window.partitionBy("user_id").orderBy("tsq", "event_id")
    ev.select(col("user_id"), col("event_type"), col("value"), col("tsq").as("st"),
        lead("tsq", 1).over(w).as("en"))
      .where(col("en").isNotNull)
      .select(col("user_id"), col("event_type"), col("value"),
        IntervalCols.interval(col("st"), col("en")).as("span"))
  }

  private val esSql =
    """es0 AS (
      |  SELECT user_id, event_type, value, epoch_ns(ts) AS s,
      |         epoch_ns(lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) AS e
      |  FROM events),
      |es AS (SELECT * FROM es0 WHERE e IS NOT NULL)""".stripMargin

  /** Interval fixture over orders: span = [orderdate, orderdate + (1..30) days)
    * with a deterministic per-key width (FIXTURES.md `order_spans`). */
  private def orderSpans(spark: SparkSession, dir: String): DataFrame = {
    // o_orderdate is TIMESTAMP_NTZ; session TZ is pinned UTC so the cast is
    // lossless and epoch_us(naive) on the DuckDB side agrees.
    val startNs = unix_micros(col("o_orderdate").cast("timestamp")) * 1000L
    table(spark, dir, "orders").select(
      col("o_orderkey"),
      IntervalCols.interval(
        startNs,
        startNs + (pmod(col("o_orderkey"), lit(30L)) + 1L) * lit(86400000000000L)).as("span"))
  }

  private val osSql =
    """os AS (
      |  SELECT o_orderkey, epoch_us(o_orderdate)*1000 AS s,
      |         epoch_us(o_orderdate)*1000 + ((o_orderkey % 30)+1)*86400000000000 AS e
      |  FROM orders)""".stripMargin

  /** DuckDB CTE emitting the same integer-exact quantile windows as
    * [[QuantileWindows]]: b(i) = lo + i*(W//n) + (i*(W%n))//n. */
  private def winSql(n: Int, loExpr: String, hiExpr: String, src: String): String =
    s"""sp AS (SELECT $loExpr AS lo, $hiExpr AS hi FROM $src),
       |win AS (SELECT i + 1 AS idx,
       |               lo + i*((hi-lo)//$n) + (i*((hi-lo)%$n))//$n AS ws,
       |               lo + (i+1)*((hi-lo)//$n) + ((i+1)*((hi-lo)%$n))//$n AS we
       |        FROM sp, range($n) t(i))""".stripMargin

  private def windowsOver(df: DataFrame, n: Int, label: String): DataFrame =
    QuantileWindows.quantileWindows(n, df, "span", label)

  /** Flatten a join output's intersection struct to istart/istop longs. */
  private def flat(j: DataFrame, cols: String*): DataFrame =
    j.select(cols.map(col) :+ col("span.start").as("istart") :+ col("span.stop").as("istop"): _*)

  // ---------------------------------------------------------------- contract

  /** Flagship: the reference README's demo query (README.md:66-84) — join
    * event spans against quantile windows and aggregate per window. */
  def entry(spark: SparkSession): DataFrame =
    queries("q07_grouped_interval_join")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // I5+I6: window generation over the covering span of event spans
    "q01_quantile_windows" -> ((sp, dir) => {
      windowsOver(eventSpans(sp, dir), 1000, "idx")
        .select(col("idx"), col("span.start").as("ws"), col("span.stop").as("we"))
    }),

    // I1+I4: inner overlap join, intersection column
    "q02_interval_join_inner" -> ((sp, dir) => {
      val es = eventSpans(sp, dir)
      val j = IntervalJoin.intervalJoin(es, windowsOver(es, 100, "idx"), "span")
      flat(j, "idx", "user_id", "event_type", "value")
    }),

    // I2 keepleft: windows over only the first half of the order span
    "q03_interval_join_left" -> ((sp, dir) => {
      val os = orderSpans(sp, dir)
      val Some((lo, hi)) = IntervalCols.coveringSpan(os, "span")
      val wins = QuantileWindows.quantileWindows(sp, 50, lo, lo + (hi - lo) / 2, "span", "idx")
      val j = IntervalJoin.intervalJoin(os, wins, "span", Options(keepleft = true))
      flat(j, "idx", "o_orderkey")
    }),

    // I2 keepright: sparse spans against dense windows
    "q04_interval_join_right" -> ((sp, dir) => {
      val os = orderSpans(sp, dir).where(pmod(col("o_orderkey"), lit(97L)) === 0L)
      val osAll = orderSpans(sp, dir)
      val Some((lo, hi)) = IntervalCols.coveringSpan(osAll, "span")
      val wins = QuantileWindows.quantileWindows(sp, 1000, lo, hi, "span", "idx")
      val j = IntervalJoin.intervalJoin(os, wins, "span", Options(keepright = true))
      flat(j, "idx", "o_orderkey")
    }),

    // I2 full outer: unmatched rows on both sides
    "q05_interval_join_full" -> ((sp, dir) => {
      val osAll = orderSpans(sp, dir)
      val os = osAll.where(pmod(col("o_orderkey"), lit(40L)) === 0L)
      val Some((lo, hi)) = IntervalCols.coveringSpan(osAll, "span")
      val wins = QuantileWindows.quantileWindows(sp, 1000, lo, lo + (hi - lo) / 2, "span", "idx")
      val j = IntervalJoin.intervalJoin(os, wins, "span",
        Options(keepleft = true, keepright = true))
      flat(j, "idx", "o_orderkey")
    }),

    // I6: covering-span aggregate
    "q06_span_agg" -> ((sp, dir) => {
      eventSpans(sp, dir).agg(
        min(col("span.start")).as("lo"), max(col("span.stop")).as("hi"))
    }),

    // I7 (+I1+I4+I5+I6): the README demo — duration-weighted mean per window
    "q07_grouped_interval_join" -> ((sp, dir) => {
      val es = eventSpans(sp, dir)
      val g = GroupedIntervalJoin.groupbyIntervalJoin(
        es, windowsOver(es, 4, "idx"), Seq(Selector.Name("idx")), "span" -> "span")
      val dsec = (col("span.stop") - col("span.start")).cast("double") / 1e9
      g.joined.groupBy("idx").agg(
        round(sum(col("value") * dsec) / sum(dsec), 6).as("wmean"),
        count(lit(1)).as("n"))
    }),

    // I1 via the Binned strategy: big×big self overlap join, aggregated
    "q08_interval_join_binned" -> ((sp, dir) => {
      val os = orderSpans(sp, dir).where(pmod(col("o_orderkey"), lit(3L)) === 0L)
      val j = IntervalJoin.intervalJoin(os, os, "span", Options(
        renamecols = (_ + "_a", _ + "_b"), strategy = Strategy.Binned))
      // exact integer division — epoch-ns magnitudes exceed Double's mantissa
      j.groupBy(expr("span_left.start div 2592000000000000").as("bucket"))
        .agg(count(lit(1)).as("pairs"),
          sum(col("span.stop") - col("span.start")).as("overlap_ns"))
    }),

    // Delegated: hash aggregate with exact decimal sums (TPC-H Q1 shape)
    "q20_delegated_agg" -> ((sp, dir) => {
      table(sp, dir, "lineitem").groupBy("l_returnflag", "l_linestatus").agg(
        sum(col("l_quantity").cast(DecimalType(18, 2))).as("sum_qty"),
        sum(col("l_extendedprice").cast(DecimalType(18, 2))).as("sum_price"),
        count(lit(1)).as("n"))
    }),

    // Delegated: window function (top order per customer)
    "q21_delegated_window" -> ((sp, dir) => {
      val o = table(sp, dir, "orders")
      val w = Window.partitionBy("o_custkey").orderBy(col("o_totalprice").desc, col("o_orderkey"))
      o.withColumn("rn", row_number().over(w)).where(col("rn") === 1)
        .select("o_custkey", "o_orderkey", "o_totalprice")
    }),

    // Delegated: multi-way equi-join + aggregate (broadcast dims)
    "q22_delegated_join_agg" -> ((sp, dir) => {
      val c = table(sp, dir, "customer")
      val o = table(sp, dir, "orders")
      val n = table(sp, dir, "nation")
      o.join(c, o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .groupBy("n_name")
        .agg(sum(col("o_totalprice").cast(DecimalType(18, 2))).as("rev"),
          count(lit(1)).as("n_orders"))
    }),

    // Delegated: anti join (customers without orders)
    "q23_delegated_anti" -> ((sp, dir) => {
      val c = table(sp, dir, "customer")
      val o = table(sp, dir, "orders")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti").select("c_custkey")
    })
  )

  def oracleSql: Map[String, String] = Map(
    "q01_quantile_windows" ->
      s"""WITH $esSql, ${winSql(1000, "min(s)", "max(e)", "es")}
         |SELECT idx, ws, we FROM win""".stripMargin,

    "q02_interval_join_inner" ->
      s"""WITH $esSql, ${winSql(100, "min(s)", "max(e)", "es")}
         |SELECT idx, user_id, event_type, value,
         |       greatest(s, ws) AS istart, least(e, we) AS istop
         |FROM es JOIN win ON s < we AND ws < e""".stripMargin,

    "q03_interval_join_left" ->
      s"""WITH $osSql, ${winSql(50, "min(s)", "min(s) + (max(e)-min(s))//2", "os")}
         |SELECT idx, o_orderkey,
         |       CASE WHEN idx IS NULL THEN NULL ELSE greatest(s, ws) END AS istart,
         |       CASE WHEN idx IS NULL THEN NULL ELSE least(e, we) END AS istop
         |FROM os LEFT JOIN win ON s < we AND ws < e""".stripMargin,

    "q04_interval_join_right" ->
      s"""WITH $osSql, ${winSql(1000, "min(s)", "max(e)", "os")},
         |os2 AS (SELECT * FROM os WHERE o_orderkey % 97 = 0)
         |SELECT idx, o_orderkey,
         |       CASE WHEN o_orderkey IS NULL THEN NULL ELSE greatest(s, ws) END AS istart,
         |       CASE WHEN o_orderkey IS NULL THEN NULL ELSE least(e, we) END AS istop
         |FROM os2 RIGHT JOIN win ON s < we AND ws < e""".stripMargin,

    "q05_interval_join_full" ->
      s"""WITH $osSql, ${winSql(1000, "min(s)", "min(s) + (max(e)-min(s))//2", "os")},
         |os2 AS (SELECT * FROM os WHERE o_orderkey % 40 = 0)
         |SELECT idx, o_orderkey,
         |       CASE WHEN idx IS NULL OR o_orderkey IS NULL THEN NULL ELSE greatest(s, ws) END AS istart,
         |       CASE WHEN idx IS NULL OR o_orderkey IS NULL THEN NULL ELSE least(e, we) END AS istop
         |FROM os2 FULL JOIN win ON s < we AND ws < e""".stripMargin,

    "q06_span_agg" ->
      s"""WITH $esSql SELECT min(s) AS lo, max(e) AS hi FROM es""".stripMargin,

    "q07_grouped_interval_join" ->
      s"""WITH $esSql, ${winSql(4, "min(s)", "max(e)", "es")}
         |SELECT idx,
         |       round(sum(value * ((least(e, we) - greatest(s, ws))/1e9))
         |             / sum((least(e, we) - greatest(s, ws))/1e9), 6) AS wmean,
         |       count(*) AS n
         |FROM es JOIN win ON s < we AND ws < e
         |GROUP BY idx""".stripMargin,

    "q08_interval_join_binned" ->
      s"""WITH $osSql, os2 AS (SELECT * FROM os WHERE o_orderkey % 3 = 0)
         |SELECT l.s // 2592000000000000 AS bucket,
         |       count(*) AS pairs,
         |       CAST(sum(least(l.e, r.e) - greatest(l.s, r.s)) AS BIGINT) AS overlap_ns
         |FROM os2 l, os2 r WHERE l.s < r.e AND r.s < l.e
         |GROUP BY 1""".stripMargin,

    "q20_delegated_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |       sum(CAST(l_quantity AS DECIMAL(18,2))) AS sum_qty,
        |       sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS sum_price,
        |       count(*) AS n
        |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin,

    "q21_delegated_window" ->
      """SELECT o_custkey, o_orderkey, o_totalprice FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |         row_number() OVER (PARTITION BY o_custkey
        |                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders) WHERE rn = 1""".stripMargin,

    "q22_delegated_join_agg" ->
      """SELECT n_name, sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev, count(*) AS n_orders
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name""".stripMargin,

    "q23_delegated_anti" ->
      """SELECT c_custkey FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""".stripMargin
  )
}
