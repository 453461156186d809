package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus TF-IDF — the inverted-index-shaped text scorer a training-data
  * pipeline uses for keyword extraction and quality filters.
  *
  * Distributed shape: explode lowercase whitespace tokens, aggregate term
  * frequency per (doc, term), document frequency per term, then one
  * term-keyed equi-join tf ⋈ df plus a broadcast of the single-row corpus
  * count. Everything is shuffle-on-key + broadcast — no driver-side
  * materialization, no nested loop; at 100 TB the tf→df aggregation is a
  * map-side-combining two-level reduction and the skewed stopword terms are
  * AQE-splittable.
  *
  * Smoothed idf: `ln((N + 1) / (df + 1)) + 1` (always positive, defined for
  * df = N).
  */
object TfIdf {

  /** One row per (doc, term): `id, term, tf, df, score`. Document frequency
    * comes from a count-over-term window on the already-unique (doc, term)
    * rows — one term-keyed sort instead of a groupBy + self-join (the tf
    * frame would otherwise be computed once per join side). */
  def docTermScores(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = docs.select(col(idCol).as("id"),
      explode(TextFunctions.tokens(lower(col(textCol)))).as("term"))
    val tf = toks.groupBy("id", "term").agg(count(lit(1)).as("tf"))
    val n = docs.agg(count(lit(1)).as("__n"))
    val wTerm = Window.partitionBy("term")
    tf.withColumn("df", count(lit(1)).over(wTerm))
      .crossJoin(broadcast(n))
      .select(col("id"), col("term"), col("tf"), col("df"),
        (col("tf") * (log((col("__n") + 1.0) / (col("df") + 1.0)) + 1.0)).as("score"))
  }

  /** Top-`k` terms per document by score (ties broken by term) — bounds the
    * output to k rows per document. */
  def topTerms(docs: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    val w = Window.partitionBy("id").orderBy(col("score").desc, col("term"))
    docTermScores(docs, idCol, textCol)
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
  }
}
