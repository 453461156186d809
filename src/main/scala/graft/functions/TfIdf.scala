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

  /** Okapi BM25 top-`k` retrieval: score every document against every query
    * and keep the `k` best per query.
    *
    * Distributed shape — the retrieval plan that holds at corpus scale:
    * postings (tf per (doc, term)), document lengths, and document
    * frequencies are ONE tokenize pass plus map-side-combining aggregates;
    * the query set (small by nature) is broadcast into a term-keyed
    * equi-join against the postings, so the corpus never moves except by
    * its own term/doc keys; the single-row (N, avgdl) stats frame is a
    * broadcast cross. Per-(query, doc) scores fold the per-term
    * contributions in sorted term order from 0.0 — the same deterministic
    * summation an external replay produces, so results are engine-exact
    * (then rounded to 6 dp so `ln` ulp noise cannot surface). Ranking ties
    * break by doc id; `row_number` bounds output to k rows per query via
    * TakeOrderedAndProject-shaped window pruning.
    *
    * Tokens are lowercase whitespace words (matching [[docTermScores]]);
    * query term multiplicity is ignored (standard for short queries).
    * Output: `(qid, doc_id, score, rank)`, rank 1-based, rank <= k.
    */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
      queries: DataFrame, qidCol: String, qtextCol: String,
      k: Int, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(k >= 1, s"bm25TopK requires k >= 1, got $k")
    val toks = docs.select(col(idCol).cast("long").as("id"),
      explode(TextFunctions.tokens(lower(col(textCol)))).as("term"))
    val tf = toks.groupBy("id", "term").agg(count(lit(1)).as("tf"))
    val dl = toks.groupBy("id").agg(count(lit(1)).as("dl"))
    val dfr = tf.groupBy("term").agg(count(lit(1)).as("df"))
    // N counts ALL docs (token-less docs score nothing but shift idf/avgdl)
    val stats = docs.agg(count(lit(1)).as("__n"))
      .crossJoin(toks.agg(count(lit(1)).as("__s")))
      .select(col("__n"), (col("__s").cast("double") / col("__n")).as("__avgdl"))
    val qterms = queries.select(col(qidCol).cast("long").as("qid"),
      explode(array_distinct(TextFunctions.tokens(lower(col(qtextCol))))).as("term"))
    // contribution per matched (query, doc, term); float op order mirrors
    // the SQL replay exactly: (1-b) is a plan-time constant, b*dl divides
    // by avgdl left-to-right
    val contrib =
      (log(lit(1.0) + (col("__n") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
        * (col("tf") * lit(k1 + 1.0))
        / (col("tf") + lit(k1) * (lit(1.0 - b) + (lit(b) * col("dl")) / col("__avgdl"))))
    val matched = broadcast(qterms)
      .join(tf, "term").join(dl, "id").join(dfr, "term")
      .crossJoin(broadcast(stats))
      .select(col("qid"), col("id"), struct(col("term"), contrib.as("c")).as("x"))
    val w = Window.partitionBy("qid").orderBy(col("score").desc, col("doc_id"))
    matched.groupBy("qid", "id")
      .agg(sort_array(collect_list(col("x"))).as("__xs"))
      .select(col("qid"), col("id").as("doc_id"),
        round(aggregate(transform(col("__xs"), x => x.getField("c")),
          lit(0.0), (acc, v) => acc + v), 6).as("score"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
  }
}
