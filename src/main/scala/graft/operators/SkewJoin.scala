package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-mitigating salted equi-join.
  *
  * A plain equi-join shuffles both sides by the key: one hot key (the
  * stopword term, the null-ish default id, the mega-customer) lands on ONE
  * reducer and the stage runs at the speed of that straggler. Salting
  * spreads it: the probe side gets a deterministic salt in `[0, nSalts)`,
  * the build side is replicated once per salt, and the join key becomes
  * `(keys..., salt)` — the hot key now hashes to `nSalts` partitions.
  *
  * This is the STATIC form of what AQE's skew-join optimization does
  * adaptively (splitting oversized partitions at runtime). Keep AQE on for
  * unknown skew; reach for explicit salting when the skew is known and
  * stable (Zipfian term tables, power-law user activity) or when the join
  * sits under an operator AQE cannot re-plan (a custom physical plan, a
  * streaming stage), and size `nSalts` ≈ hot-partition-bytes /
  * target-partition-bytes.
  *
  * Cost model: build-side bytes × `nSalts` extra shuffle volume — use only
  * when the build side is much smaller than the hot key's row count (but
  * too big or too hot to broadcast outright).
  *
  * The result is row-for-row IDENTICAL to `left.join(right, keys,
  * joinType)`: every left row carries exactly one salt, and the matching
  * right replica exists for every salt value. Supported join types:
  * `inner` and `left`/`left_outer` — an unmatched left row surfaces once
  * with its single salt. (`right`/`full` outer would surface each
  * unmatched BUILD row once per replica; use the mirrored call instead.)
  * The salt is derived from a 64-bit hash of the entire probe row, so it
  * is deterministic across runs, retries, and partitionings — no
  * `rand()`/`monotonically_increasing_id` nondeterminism under task
  * replay.
  */
object SkewJoin {

  def saltedJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      nSalts: Int, joinType: String = "inner"): DataFrame = {
    require(keys.nonEmpty, "saltedJoin requires at least one join key")
    require(nSalts >= 1, s"nSalts must be >= 1, got $nSalts")
    require(Seq("inner", "left", "left_outer").contains(joinType),
      s"saltedJoin supports inner/left joins, got `$joinType` " +
        "(right/full outer would duplicate unmatched build rows per salt)")
    Seq(left, right).foreach(df =>
      require(!df.columns.contains("__salt"),
        "saltedJoin reserves the working column `__salt`; rename it"))
    keys.foreach { k =>
      require(left.columns.contains(k), s"left side lacks join key `$k`")
      require(right.columns.contains(k), s"right side lacks join key `$k`")
    }
    val l = left.withColumn("__salt",
      pmod(xxhash64(left.columns.map(col) :+ lit("graft-salt"): _*),
        lit(nSalts.toLong)).cast("int"))
    val r = right.withColumn("__salt",
      explode(sequence(lit(0), lit(nSalts - 1))))
    l.join(r, keys :+ "__salt", joinType).drop("__salt")
  }
}
