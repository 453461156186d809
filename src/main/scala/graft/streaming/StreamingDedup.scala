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
    * array carried for verification and cross-band dedup. */
  def prepareCorpus(corpus: DataFrame, textCol: String, idCol: String,
      k: Int = 16, bands: Int = 4, shingleN: Int = 5): DataFrame =
    Dedup.signatures(corpus, textCol, idCol, k, bands, shingleN)
      .where(size(col("hs")) > 0)
      .select(col("id").as("corpus_id"), col("hs").as("corpus_hs"),
        col("bhs").as("corpus_bhs"),
        posexplode(col("bhs")).as(Seq("band", "bh")))

  /** Streaming query fragment: emits one row
    * `(id, corpus_id, jaccard)` per stream document whose verified Jaccard
    * against a corpus document reaches `threshold`. A pair agreeing on
    * several bands is emitted exactly once — kept only in the FIRST band
    * where the two band-hash arrays agree (a residual predicate, no
    * aggregation, so the plan stays append-mode stateless). */
  def nearDupAgainstCorpus(stream: DataFrame, corpusBands: DataFrame,
      textCol: String, idCol: String,
      k: Int = 16, bands: Int = 4, shingleN: Int = 5,
      threshold: Double = 0.5): DataFrame = {
    require(threshold > 0.0, "nearDupAgainstCorpus requires a positive threshold")
    val s = Dedup.signatures(stream, textCol, idCol, k, bands, shingleN)
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
