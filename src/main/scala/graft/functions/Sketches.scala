package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import TextFunctions.{tokenHash, tokenHashMod}

/** Distributed probabilistic sketches for corpus statistics at 100 TB —
  * count-min (frequency estimation), HyperLogLog (distinct counting), and
  * Bloom filters (membership / cheap dedup-against-history). Unlike the
  * engine-opaque built-ins (`approx_count_distinct`), every sketch here is
  * a DETERMINISTIC function of the input multiset: hashes are md5-derived
  * ([[TextFunctions.tokenHash]]) and every merge is a commutative
  * max/sum/min aggregate, so results are bit-identical across runs,
  * partitionings, and engines — a SQL oracle replays the whole sketch.
  *
  * All three build as map-side-combining aggregates whose shuffle volume is
  * the SKETCH size (d·w counters / 2^p registers / set bits), never the
  * corpus size — the whole point of sketching at scale.
  */
object Sketches {

  // ---------------------------------------------------------------- count-min

  /** Row-`r` count-min bucket of a value: salted 60-bit md5 mod `width`.
    * (The mod-P reduction keeps the SQL replay in DuckDB's exact BIGINT
    * range, same as every hash in this library.) */
  def cmsBucket(v: Column, row: Int, width: Int, salt: String): Column =
    tokenHashMod(concat(lit(s"cms:$salt:$row:"), v.cast("string"))) % width

  /** Build a depth×width count-min sketch over `valueCol` (multiset
    * semantics: every row counts). Output: (row, bucket, cnt) — only
    * occupied cells; absent cells are zero. One map-side-combining
    * aggregate; the shuffle carries at most depth·width partial cells per
    * map partition regardless of corpus size. */
  def cmsSketch(df: DataFrame, valueCol: String, depth: Int, width: Int,
      salt: String = ""): DataFrame = {
    require(depth >= 1 && width >= 1, s"need depth,width >= 1: $depth x $width")
    val cells = (0 until depth).map(r =>
      struct(lit(r).as("row"), cmsBucket(col(valueCol), r, width, salt).as("bucket")))
    df.select(explode(array(cells: _*)).as("c"))
      .groupBy(col("c.row").as("row"), col("c.bucket").as("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Point-estimate the counts of `probe`'s values against a built sketch:
    * est(v) = min over rows of the cell count (0 if any cell is absent).
    * The classic CMS guarantee holds: est >= true count, with overestimates
    * only from bucket collisions. `probe` rows are looked up independently
    * (callers pass distinct values). Plan: probe explodes to depth cells,
    * ONE equi-join on (row, bucket) against the sketch, one regroup. */
  def cmsLookup(sketch: DataFrame, probe: DataFrame, valueCol: String,
      depth: Int, width: Int, salt: String = ""): DataFrame = {
    val cells = (0 until depth).map(r =>
      struct(lit(r).as("row"), cmsBucket(col(valueCol), r, width, salt).as("bucket")))
    probe.select(col(valueCol).as("__v"), explode(array(cells: _*)).as("c"))
      .select(col("__v"), col("c.row").as("row"), col("c.bucket").as("bucket"))
      .join(sketch, Seq("row", "bucket"), "left")
      .groupBy(col("__v").as(valueCol))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
  }

  // -------------------------------------------------------------- HyperLogLog

  /** Total bits of the 60-bit md5 hash feeding HLL. */
  val HllHashBits = 60

  /** Per-value HLL (register, rho): register = low p bits of the 60-bit
    * hash; rho = 1 + leading zeros of the remaining (60-p)-bit suffix
    * (suffix 0 → rho = 60-p+1, the all-zeros convention). Bit length comes
    * from the binary string rendering (`bin`), exact in both Spark and
    * DuckDB — no float log2 edge cases. */
  def hllRegisterRho(v: Column, p: Int, salt: String): (Column, Column) = {
    val m = 1L << p
    val h = tokenHash(concat(lit(s"hll:$salt:"), v.cast("string")))
    // h >> p: exact (60-p)-bit suffix — never double division (2^60 > 2^53)
    val suffix = shiftright(h, p)
    val bitlen = when(suffix === 0L, lit(0)).otherwise(length(bin(suffix)))
    (pmod(h, lit(m)), lit(HllHashBits - p + 1) - bitlen)
  }

  /** Build the 2^p-register HLL sketch over `valueCol`: one row per
    * OCCUPIED register — (register, rho) with rho the max over values.
    * Max is commutative/idempotent, so this is a single map-side-combining
    * aggregate shuffling at most 2^p rows per map partition; sketches of
    * disjoint corpora merge by max again (union semantics). */
  def hllSketch(df: DataFrame, valueCol: String, p: Int,
      salt: String = ""): DataFrame = {
    require(p >= 4 && p <= 18, s"p must be in [4,18]: $p")
    val (reg, rho) = hllRegisterRho(col(valueCol), p, salt)
    df.select(reg.as("register"), rho.as("rho"))
      .groupBy("register").agg(max("rho").as("rho"))
  }

  /** The HLL bias-correction constant alpha_m (Flajolet et al. 2007). */
  def hllAlpha(m: Int): Double = m match {
    case 16 => 0.673
    case 32 => 0.697
    case 64 => 0.709
    case _  => 0.7213 / (1.0 + 1.079 / m)
  }

  /** Cardinality estimate from a built sketch: the standard estimator
    * alpha_m · m² / Σ 2^(-M_j) with the small-range linear-counting
    * correction (E <= 2.5m and empty registers present → m·ln(m/V)).
    * Empty registers materialize via `spark.range(m)` + left join so the
    * harmonic sum runs over all m registers; the fold runs in REGISTER
    * ORDER from a 0.0 seed (2^-M is a dyadic rational — exact in binary
    * floating point — so the sorted fold is engine-bit-identical).
    * Output: one row — (m, n_zero, est) with est rounded to 6 dp. */
  def hllEstimate(sketch: DataFrame, p: Int): DataFrame = {
    val m = 1 << p
    val alpha = hllAlpha(m)
    val spark = sketch.sparkSession
    val full = spark.range(m).toDF("register")
      .join(sketch, Seq("register"), "left")
      .select(col("register"), coalesce(col("rho"), lit(0)).as("rho"))
    full
      .agg(sort_array(collect_list(struct(col("register"), col("rho")))).as("__rs"))
      .select(
        aggregate(transform(col("__rs"), x => pow(lit(2.0), -x.getField("rho"))),
          lit(0.0), (a, v) => a + v).as("__hsum"),
        aggregate(transform(col("__rs"),
            x => when(x.getField("rho") === 0, 1L).otherwise(0L)),
          lit(0L), (a, v) => a + v).as("n_zero"))
      .select(lit(m).as("m"), col("n_zero"),
        round(
          when(lit(alpha * m * m) / col("__hsum") <= lit(2.5 * m) &&
               col("n_zero") > 0L,
            lit(m.toDouble) * log(lit(m.toDouble) / col("n_zero")))
          .otherwise(lit(alpha * m * m) / col("__hsum")),
          6).as("est"))
  }

  /** Per-group HLL registers: like [[hllSketch]] but keyed — (keys…,
    * register, rho), at most 2^p state rows per group. The grouped
    * distinct-count estimate (distinct users per segment, distinct docs
    * per domain) where per-group exact distincts would shuffle the
    * world. Sketches for the same key max-merge across frames/batches. */
  def hllSketchGrouped(df: DataFrame, keys: Seq[String], valueCol: String,
      p: Int, salt: String = ""): DataFrame = {
    require(p >= 4 && p <= 18, s"p must be in [4,18]: $p")
    val (reg, rho) = hllRegisterRho(col(valueCol), p, salt)
    df.select(keys.map(col) :+ reg.as("register") :+ rho.as("rho"): _*)
      .groupBy(keys.map(col) :+ col("register"): _*).agg(max("rho").as("rho"))
  }

  /** Per-group estimate from [[hllSketchGrouped]] output — the same
    * bias-corrected harmonic mean + small-range linear counting as
    * [[hllEstimate]], with every group's 2^p registers materialized (a
    * broadcast `range(m)` cross of the DISTINCT key frame) and folded in
    * register order from 0.0 (engine-exact, the q72 rule). Output:
    * (keys…, m, n_zero, est). */
  def hllEstimateGrouped(sketch: DataFrame, keys: Seq[String], p: Int): DataFrame = {
    val m = 1 << p
    val alpha = hllAlpha(m)
    val spark = sketch.sparkSession
    val keyF = sketch.select(keys.map(col): _*).distinct()
    val full = keyF.crossJoin(broadcast(spark.range(m).toDF("register")))
      .join(sketch, keys :+ "register", "left")
      .select(keys.map(col) :+ col("register") :+
        coalesce(col("rho"), lit(0)).as("rho"): _*)
    full.groupBy(keys.map(col): _*)
      .agg(sort_array(collect_list(struct(col("register"), col("rho"))))
        .as("__rs"))
      .select(keys.map(col) :+
        aggregate(transform(col("__rs"), x => pow(lit(2.0), -x.getField("rho"))),
          lit(0.0), (a, v) => a + v).as("__hsum") :+
        aggregate(transform(col("__rs"),
            x => when(x.getField("rho") === 0, 1L).otherwise(0L)),
          lit(0L), (a, v) => a + v).as("n_zero"): _*)
      .select(keys.map(col) :+ lit(m).as("m") :+ col("n_zero") :+
        round(
          when(lit(alpha * m * m) / col("__hsum") <= lit(2.5 * m) &&
               col("n_zero") > 0L,
            lit(m.toDouble) * log(lit(m.toDouble) / col("n_zero")))
          .otherwise(lit(alpha * m * m) / col("__hsum")),
          6).as("est"): _*)
  }

  // ------------------------------------------------------------ heavy hitters

  /** EXACT heavy hitters — every value whose multiset count reaches
    * `total div shareDivisor` (e.g. divisor 30 = the 1/30-share hitters) —
    * found with a sketch-gated two-pass plan: a count-min pass nominates
    * candidates (COMPLETE by the CMS one-sided guarantee: est >= true, so
    * no true hitter can be missed), then the exact pass counts ONLY rows
    * whose value survived the gate (a broadcast semi-join — the candidate
    * set is at most a heavy-hitter bound `shareDivisor · depth`-ish, tiny)
    * and re-applies the threshold to discard the sketch's false positives.
    * The contract is exact; the sketch only shapes the plan: the final
    * aggregate's shuffle carries candidate rows alone, and the threshold is
    * a single broadcast row — no driver-side state anywhere.
    *
    * Output: (valueCol, cnt), exactly the values with cnt >= threshold. */
  def heavyHittersByShare(items: DataFrame, valueCol: String,
      shareDivisor: Long, depth: Int = 4, width: Int = 64,
      salt: String = "hh"): DataFrame = {
    require(shareDivisor >= 1, s"shareDivisor must be >= 1: $shareDivisor")
    val thr = items.agg(count(lit(1)).as("__t"))
      .select(expr(s"__t div $shareDivisor").as("__thr"))
    val ests = cmsLookup(cmsSketch(items, valueCol, depth, width, salt),
      items.select(valueCol).distinct(), valueCol, depth, width, salt)
    val cands = ests.crossJoin(broadcast(thr))
      .where(col("est") >= col("__thr")).select(col(valueCol))
    items.join(broadcast(cands), Seq(valueCol), "left_semi")
      .groupBy(valueCol).agg(count(lit(1)).as("cnt"))
      .crossJoin(broadcast(thr))
      .where(col("cnt") >= col("__thr"))
      .select(col(valueCol), col("cnt"))
  }

  // ------------------------------------------------------------- Bloom filter

  /** The k salted bit positions of a value in an m-bit Bloom filter. */
  private def bloomCells(v: Column, numBits: Long, k: Int, salt: String): Seq[Column] =
    (0 until k).map(i =>
      tokenHashMod(concat(lit(s"bloom:$salt:$i:"), v.cast("string"))) % numBits)

  /** Build a Bloom filter over `valueCol` as its SET BIT POSITIONS — one
    * row per distinct set bit (at most `numBits` rows total, usually far
    * fewer). Relational representation: merges by union, persists as a
    * tiny table, and probes as a join — no driver-side bitset, no UDAF.
    * numBits/k size the false-positive rate the standard way
    * (fpr ≈ (1 - e^(-k·n/m))^k). */
  def bloomBits(df: DataFrame, valueCol: String, numBits: Long, k: Int,
      salt: String = ""): DataFrame = {
    require(numBits >= 1 && k >= 1, s"need numBits,k >= 1: $numBits, $k")
    val cells = bloomCells(col(valueCol), numBits, k, salt)
    df.select(explode(array(cells: _*)).as("pos")).distinct()
  }

  /** Probe values against a built filter: present iff ALL k bit positions
    * are set — no false negatives ever; false positives at the designed
    * rate. The production shape of "is this document's content already in
    * the history?" when the history is too big to join directly: the bit
    * table is tiny (≤ numBits rows) and broadcasts. Output: exactly one
    * row per probe row (duplicate probe rows stay duplicated) —
    * (probe columns..., present). Shape: k broadcast hash joins, one per
    * bit position — the probe side never shuffles and never collapses, so
    * there is no unique-key requirement on the probe frame. */
  def bloomProbe(bits: DataFrame, probe: DataFrame, valueCol: String,
      numBits: Long, k: Int, salt: String = ""): DataFrame = {
    val reserved = Set("pos", "present") ++ (0 until k).map(i => s"__set$i")
    val clash = probe.columns.toSet.intersect(reserved)
    require(clash.isEmpty,
      s"this operator reserves ${clash.mkString(", ")}; rename the probe column(s)")
    val cells = bloomCells(col(valueCol), numBits, k, salt)
    val marked = broadcast(bits.withColumn("__set", lit(true)))
    val joined = cells.zipWithIndex.foldLeft(probe) { case (cur, (cell, i)) =>
      cur.join(marked, cell === marked("pos"), "left")
        .drop("pos").withColumnRenamed("__set", s"__set$i")
    }
    joined
      .withColumn("present", (0 until k)
        .map(i => coalesce(col(s"__set$i"), lit(false))).reduce(_ && _))
      .drop((0 until k).map(i => s"__set$i"): _*)
  }
}
