package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Dedup

/** Near-duplicate detection over a document STREAM against a static
  * reference corpus — the "is this incoming document a near-copy of
  * anything we already ingested" primitive of a training-data pipeline.
  * (The reference engine is batch-only; this extends its dedup surface to
  * Structured Streaming.)
  *
  * Scale design: the corpus is prepared ONCE ([[prepareCorpus]]) into one
  * row per (band, band-hash) carrying the corpus document's signature; each
  * micro-batch computes the same MinHash signatures for its documents
  * (narrow, partition-parallel — [[Dedup.signatures]]), explodes to band
  * hashes, and equi-joins the prepared table. The join is a STATELESS
  * stream-static inner join, so streaming state never grows with the
  * stream; Spark broadcasts the corpus side while it is small, and at
  * cluster scale the corpus table is instead written bucketed by
  * (band, bh) so each micro-batch joins co-located. Candidate pairs are
  * verified with the exact hash-set Jaccard before emission.
  */
object StreamingDedup {

  /** Corpus side, computed once per corpus version: one row per
    * (band, bh) with the document's hashed shingle set and full band-hash
    * array carried for verification and cross-band dedup. The result is
    * `persist()`ed — a stream-static join re-evaluates an un-cached static
    * side on EVERY micro-batch, which would recompute the corpus signatures
    * per trigger; the caller owns `unpersist()` on corpus rotation (or
    * writes the table out bucketed by (band, bh) at scale). The signature
    * parameters are recorded in the `corpus_bhs` column metadata so the
    * join side can reject a mismatched configuration. */
  def prepareCorpus(corpus: DataFrame, textCol: String, idCol: String,
      k: Int = 16, bands: Int = 4, shingleN: Int = 5,
      seed: Long = 42L): DataFrame = {
    val meta = new org.apache.spark.sql.types.MetadataBuilder()
      .putLong("graft.k", k).putLong("graft.bands", bands)
      .putLong("graft.shingleN", shingleN).putLong("graft.seed", seed).build()
    Dedup.signatures(corpus, textCol, idCol, k, bands, shingleN, seed)
      .where(size(col("hs")) > 0)
      .select(col("id").as("corpus_id"), col("hs").as("corpus_hs"),
        col("bhs").as("corpus_bhs", meta),
        posexplode(col("bhs")).as(Seq("band", "bh")))
      .persist()
  }

  /** Streaming query fragment: emits one row
    * `(id, corpus_id, jaccard)` per stream document whose verified Jaccard
    * against a corpus document reaches `threshold`. A pair agreeing on
    * several bands is emitted exactly once — kept only in the FIRST band
    * where the two band-hash arrays agree (a residual predicate, no
    * aggregation, so the plan stays append-mode stateless). */
  def nearDupAgainstCorpus(stream: DataFrame, corpusBands: DataFrame,
      textCol: String, idCol: String,
      k: Int = 16, bands: Int = 4, shingleN: Int = 5,
      threshold: Double = 0.5, seed: Long = 42L): DataFrame = {
    require(threshold > 0.0, "nearDupAgainstCorpus requires a positive threshold")
    // a corpus prepared with different signature parameters would silently
    // join to (almost) nothing — reject the mismatch at plan time
    val cm = corpusBands.schema("corpus_bhs").metadata
    if (cm.contains("graft.k")) {
      val (ck, cb, cs) = (cm.getLong("graft.k"), cm.getLong("graft.bands"),
        cm.getLong("graft.shingleN"))
      val csd = if (cm.contains("graft.seed")) cm.getLong("graft.seed") else 42L
      require(ck == k && cb == bands && cs == shingleN && csd == seed,
        s"corpus prepared with (k=$ck, bands=$cb, shingleN=$cs, seed=$csd) " +
          s"but stream uses (k=$k, bands=$bands, shingleN=$shingleN, seed=$seed)")
    }
    val s = Dedup.signatures(stream, textCol, idCol, k, bands, shingleN, seed)
      .where(size(col("hs")) > 0)
      .select(col("id"), col("hs"), col("bhs"),
        posexplode(col("bhs")).as(Seq("band", "bh")))
    // first band where the two band-hash arrays agree (1-based, hence -1);
    // tiny fixed-size arrays, evaluated only on join candidates
    val firstAgree =
      array_position(zip_with(col("bhs"), col("corpus_bhs"),
        (x, y) => x === y), lit(true)) - 1L
    s.join(corpusBands, Seq("band", "bh"))
      .where(col("band").cast("long") === firstAgree)
      .withColumn("jaccard", round(Dedup.hashJaccard(col("hs"), col("corpus_hs")), 6))
      .where(col("jaccard") >= threshold)
      .select(col("id"), col("corpus_id"), col("jaccard"))
  }
}
