package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

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
    * broadcast cross. Per-(query, doc) scores sum per-term contributions
    * each rounded to 6 dp as DECIMAL(18,6) — order-exact under ANY
    * partitioning/merge order (so an external replay agrees exactly and
    * `ln` ulp noise cannot surface), and, unlike a sorted-list fold, a
    * plain sum KEEPS MAP-SIDE PARTIAL AGGREGATION: the posting-match
    * shuffle carries per-(query, doc) partial sums, not every matched
    * posting (measured 6.5 s → much less at sf0.1). Ranking ties
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
    // ONE corpus exchange feeds everything: tokens repartition by id, so
    // the (id, term) tf aggregate, the per-doc length, and the token total
    // all plan WITHOUT further exchanges (HashPartitioning(id) satisfies
    // the (id, term) clustering). dl is a window over the co-partitioned
    // tf frame — partition key is the doc id, so the window state is one
    // document's postings (bounded) and no stopword-skew hazard exists;
    // the former groupBy(id) + join-back branch cost an extra aggregate,
    // broadcast and join stage per probe. df stays a groupBy + join with
    // the strategy left to the optimizer (a term-keyed window would put a
    // whole stopword's postings in one task at 100 TB, and a forced
    // broadcast would ship an unbounded vocabulary; AQE broadcasts it at
    // small scale on real sizes). Values are identical integers either
    // way; the 6 dp contribution and its float op order are unchanged.
    val toks = docs.select(col(idCol).cast("long").as("id"),
      explode(TextFunctions.tokens(lower(col(textCol)))).as("term"))
      .repartition(col("id"))
    val tf = toks.groupBy("id", "term").agg(count(lit(1)).as("tf"))
    val dfr = tf.groupBy("term").agg(count(lit(1)).as("df"))
    // N counts ALL docs (token-less docs score nothing but shift idf/avgdl)
    val stats = docs.agg(count(lit(1)).as("__n"))
      .crossJoin(tf.agg(sum("tf").as("__s")))
      .select(col("__n"), (col("__s").cast("double") / col("__n")).as("__avgdl"))
    // The contribution is QUERY-INDEPENDENT: compute (and round) it once
    // per posting — the dl/df joins and the ln run over the posting frame,
    // not over the |qterms| x df(term) match blow-up; the match join then
    // carries a ready 6 dp term straight into the partial sum.
    val wDoc = Window.partitionBy("id")
    val postings = tf.withColumn("dl", sum("tf").over(wDoc))
      .join(dfr, "term")
      .crossJoin(broadcast(stats))
      .select(col("term"), col("id"),
        (round(bm25Contrib(col("__n"), col("__avgdl"), k1, b), 6)
          .cast(DecimalType(18, 6)) * 1000000).cast("long").as("c"))
    val matched = broadcast(bm25QueryTerms(queries, qidCol, qtextCol))
      .join(postings, "term")
      .select(col("qid"), col("id"), col("c"))
    bm25SumAndRank(matched, k)
  }

  /** Persist the corpus BM25 inverted index as a term-bucketed, term-sorted
    * catalog table: one row per posting `(term, id, tf, dl, df)` (df
    * denormalized onto the posting so the probe needs no second frame), and
    * the corpus constants (doc count, total token count) on the `term`
    * column's metadata. The expensive part of retrieval at 100 TB is the
    * tokenize + aggregate over the corpus — this pays it ONCE; every later
    * query batch is a join against the layout. Bucketing by term keeps
    * postings co-located for shuffle-free sort-merge joins when the query
    * workload is itself too big to broadcast, and for index maintenance
    * merges; broadcast probes read it shuffle-free either way. */
  def writeBm25Index(docs: DataFrame, idCol: String, textCol: String,
      tableName: String, nBuckets: Int): Unit = {
    require(nBuckets > 0, "nBuckets must be positive")
    // dl and the token total derive from tf (same values, see bm25TopK) so
    // the corpus is tokenized once per job, not once per derived frame
    val toks = docs.select(col(idCol).cast("long").as("id"),
      explode(TextFunctions.tokens(lower(col(textCol)))).as("term"))
    val tf = toks.groupBy("id", "term").agg(count(lit(1)).as("tf"))
    val dl = tf.groupBy("id").agg(sum("tf").as("dl"))
    val dfr = tf.groupBy("term").agg(count(lit(1)).as("df"))
    // the two corpus constants the scorer needs; N counts ALL docs (a
    // parquet metadata count — no tokenize)
    val nDocs = docs.count()
    val sumDl = tf.agg(coalesce(sum("tf"), lit(0L))).head.getLong(0)
    val meta = new org.apache.spark.sql.types.MetadataBuilder()
      .putLong("graft.n", nDocs).putLong("graft.sumdl", sumDl).build()
    graft.sources.ManagedTables.clearOrphanedLocation(docs.sparkSession, tableName)
    tf.join(dl, "id").join(dfr, "term")
      .select(col("term").as("term", meta), col("id"), col("tf"), col("dl"),
        col("df"))
      .write.format("parquet")
      .bucketBy(nBuckets, "term").sortBy("term")
      .mode("overwrite").saveAsTable(tableName)
  }

  /** INCREMENTAL-friendly BM25 index. [[writeBm25Index]] embeds the
    * per-term `df` in every posting row, which makes the layout
    * append-PROOF: one new document changes the df of every term it
    * contains, i.e. rows scattered across the whole history. This variant
    * splits the global state out: postings are (term, id, tf, dl) —
    * per-document facts that never change — bucketed by `term`, and a
    * companion `<name>_stats` table holds the per-term df plus one
    * NULL-term sentinel row with the corpus constants (n, sumdl), bucketed
    * by `term` with the same bucket count so the probe-time df join is
    * co-located (no shuffle on either side). Appending a batch then costs:
    * append the batch's postings (new files in the bucket layout), fold
    * the batch's df/n/sumdl into the stats table (stats-sized work — the
    * HISTORY POSTINGS ARE NEVER RE-READ). */
  def writeBm25IndexIncr(docs: DataFrame, idCol: String, textCol: String,
      tableName: String, nBuckets: Int): Unit = {
    require(nBuckets > 0, "nBuckets must be positive")
    val sp = docs.sparkSession
    val toks = docs.select(col(idCol).cast("long").as("id"),
      explode(TextFunctions.tokens(lower(col(textCol)))).as("term"))
    val tf = toks.groupBy("id", "term").agg(count(lit(1)).as("tf"))
    val dl = tf.groupBy("id").agg(sum("tf").as("dl"))
    val nDocs = docs.count()
    val sumDl = tf.agg(coalesce(sum("tf"), lit(0L))).head.getLong(0)
    graft.sources.ManagedTables.clearOrphanedLocation(sp, tableName)
    graft.sources.ManagedTables.clearOrphanedLocation(sp, s"${tableName}_stats")
    tf.join(dl, "id").select(col("term"), col("id"), col("tf"), col("dl"))
      .write.format("parquet")
      .bucketBy(nBuckets, "term").sortBy("term")
      .mode("overwrite").saveAsTable(tableName)
    val dfr = tf.groupBy("term").agg(count(lit(1)).as("df"))
      .select(col("term"), col("df"),
        lit(null).cast("long").as("n"), lit(null).cast("long").as("sumdl"))
    val sentinel = sp.range(1).select(
      lit(null).cast("string").as("term"), lit(null).cast("long").as("df"),
      lit(nDocs).as("n"), lit(sumDl).as("sumdl"))
    dfr.unionByName(sentinel)
      .write.format("parquet")
      .bucketBy(nBuckets, "term").sortBy("term")
      .mode("overwrite").saveAsTable(s"${tableName}_stats")
  }

  /** Fold a new document batch into a [[writeBm25IndexIncr]] index:
    * postings append into the existing bucket layout; per-term df and the
    * (n, sumdl) sentinel fold via a full-outer merge of the OLD STATS with
    * the batch's term counts — work proportional to the stats table, never
    * the posting history. The merged stats stage through `<name>_stats_stage`
    * (Spark cannot overwrite a table that is an input of the writing plan)
    * and then replace the stats table. Caller owns id-uniqueness across
    * batches (re-probe before appending, same contract as the band index). */
  def appendToBm25Index(newDocs: DataFrame, idCol: String, textCol: String,
      tableName: String): Unit = {
    val sp = newDocs.sparkSession
    require(sp.catalog.tableExists(tableName) &&
      sp.catalog.tableExists(s"${tableName}_stats"),
      s"no incremental BM25 index at $tableName (write one with " +
        "writeBm25IndexIncr before appending)")
    val spec = sp.sessionState.catalog.getTableMetadata(
      org.apache.spark.sql.catalyst.TableIdentifier(tableName)).bucketSpec
    require(spec.nonEmpty, s"$tableName is not a bucketed index table")
    val nBuckets = spec.get.numBuckets
    val toks = newDocs.select(col(idCol).cast("long").as("id"),
      explode(TextFunctions.tokens(lower(col(textCol)))).as("term"))
    val tf = toks.groupBy("id", "term").agg(count(lit(1)).as("tf"))
      .localCheckpoint(true) // consumed thrice: postings, df fold, sumdl
    val dl = tf.groupBy("id").agg(sum("tf").as("dl"))
    val newN = newDocs.count()
    val newSumDl = tf.agg(coalesce(sum("tf"), lit(0L))).head.getLong(0)
    tf.join(dl, "id").select(col("term"), col("id"), col("tf"), col("dl"))
      .write.format("parquet")
      .bucketBy(nBuckets, "term").sortBy("term")
      .mode("append").saveAsTable(tableName)
    val old = sp.table(s"${tableName}_stats")
    val newDf = tf.groupBy("term").agg(count(lit(1)).as("__df2"))
    val merged = old.where(col("term").isNotNull)
      .join(newDf, Seq("term"), "full_outer")
      .select(col("term"),
        (coalesce(col("df"), lit(0L)) + coalesce(col("__df2"), lit(0L))).as("df"),
        lit(null).cast("long").as("n"), lit(null).cast("long").as("sumdl"))
      .unionByName(old.where(col("term").isNull)
        .select(col("term"), col("df"),
          (col("n") + newN).as("n"), (col("sumdl") + newSumDl).as("sumdl")))
    graft.sources.ManagedTables.clearOrphanedLocation(sp, s"${tableName}_stats_stage")
    merged.write.format("parquet")
      .bucketBy(nBuckets, "term").sortBy("term")
      .mode("overwrite").saveAsTable(s"${tableName}_stats_stage")
    graft.sources.ManagedTables.clearOrphanedLocation(sp, s"${tableName}_stats")
    sp.table(s"${tableName}_stats_stage")
      .write.format("parquet")
      .bucketBy(nBuckets, "term").sortBy("term")
      .mode("overwrite").saveAsTable(s"${tableName}_stats")
    sp.sql(s"DROP TABLE IF EXISTS ${tableName}_stats_stage")
    ()
  }

  /** Tombstone DELETE from a [[writeBm25IndexIncr]] index — takedowns /
    * GDPR erasure without rewriting the posting history. Deletion is
    * LOGICAL: the ids append into a `<name>_tombstones` table that every
    * probe anti-joins (broadcast — delete batches are id-sized), and the
    * stats fold DOWN exactly the way [[appendToBm25Index]] folds them up:
    * per-term df decrements from the deleted docs' own posting rows, the
    * (n, sumdl) sentinel by their doc count and length sum, a term whose
    * last doc died leaving the lexicon entirely. All folds are long
    * arithmetic, so delete ≡ rebuild over the survivors BIT-EXACTLY
    * (pinned by spec and the q210 oracle row). The one scan this pays is
    * postings filtered by the deleted ids — work per delete batch, never
    * per probe; reclaim the posting bytes with [[compactBm25Index]].
    * Same contract as the band index: tombstones kill ids, so re-ingest a
    * deleted id only after compaction.
    *
    * IDEMPOTENT: incoming ids are anti-joined against the existing
    * tombstone set first, so re-deleting an id (overlapping delete batches
    * before compaction) is a clean no-op — the already-tombstoned id's
    * postings are still physically present and would otherwise
    * double-decrement df/n/sumdl. Crash safety: the tombstones append
    * BEFORE the stats fold, so a crash in between leaves probes
    * conservative (deleted docs masked, stats one batch stale) rather
    * than unmasked; [[compactBm25Index]] recomputes stats from the
    * surviving postings and is the repair procedure for that window. */
  def deleteFromBm25Index(ids: DataFrame, idCol: String,
      tableName: String): Unit = {
    val sp = ids.sparkSession
    require(sp.catalog.tableExists(tableName) &&
      sp.catalog.tableExists(s"${tableName}_stats"),
      s"no incremental BM25 index at $tableName (write one with " +
        "writeBm25IndexIncr before deleting)")
    val spec = sp.sessionState.catalog.getTableMetadata(
      org.apache.spark.sql.catalyst.TableIdentifier(tableName)).bucketSpec
    require(spec.nonEmpty, s"$tableName is not a bucketed index table")
    val nBuckets = spec.get.numBuckets
    val delRaw = ids.select(col(idCol).cast("long").as("id")).distinct()
    val del = (if (sp.catalog.tableExists(s"${tableName}_tombstones"))
        delRaw.join(broadcast(
          sp.table(s"${tableName}_tombstones").select("id").distinct()),
          Seq("id"), "left_anti")
      else delRaw)
      .localCheckpoint(true) // consumed twice: posting filter, tombstone append
    if (del.isEmpty) return  // every id already tombstoned — true no-op
    // the deleted docs' own posting rows drive the stats fold — deleting
    // an id the index never held is a clean no-op on every statistic
    val delPost = sp.table(tableName)
      .join(broadcast(del), Seq("id"), "left_semi")
      .localCheckpoint(true) // consumed thrice: df fold, sentinel n, sentinel sumdl
    // tombstones land FIRST: a crash before the stats swap below leaves the
    // index conservative (probes mask the ids, stats stale by one batch),
    // repairable by compactBm25Index's stats recompute
    if (!sp.catalog.tableExists(s"${tableName}_tombstones"))
      graft.sources.ManagedTables.clearOrphanedLocation(sp, s"${tableName}_tombstones")
    del.write.format("parquet").mode("append")
      .saveAsTable(s"${tableName}_tombstones")
    val nDel = delPost.select("id").distinct().count()
    val sumDlDec = delPost.agg(coalesce(sum("tf"), lit(0L))).head.getLong(0)
    val dfDec = delPost.groupBy("term").agg(count(lit(1)).as("__dfdec"))
    val old = sp.table(s"${tableName}_stats")
    val merged = old.where(col("term").isNotNull)
      .join(dfDec, Seq("term"), "left_outer")
      .select(col("term"),
        (col("df") - coalesce(col("__dfdec"), lit(0L))).as("df"),
        lit(null).cast("long").as("n"), lit(null).cast("long").as("sumdl"))
      .where(col("df") > 0L)
      .unionByName(old.where(col("term").isNull)
        .select(col("term"), col("df"),
          (col("n") - nDel).as("n"), (col("sumdl") - sumDlDec).as("sumdl")))
    graft.sources.ManagedTables.clearOrphanedLocation(sp, s"${tableName}_stats_stage")
    merged.write.format("parquet")
      .bucketBy(nBuckets, "term").sortBy("term")
      .mode("overwrite").saveAsTable(s"${tableName}_stats_stage")
    graft.sources.ManagedTables.clearOrphanedLocation(sp, s"${tableName}_stats")
    sp.table(s"${tableName}_stats_stage")
      .write.format("parquet")
      .bucketBy(nBuckets, "term").sortBy("term")
      .mode("overwrite").saveAsTable(s"${tableName}_stats")
    sp.sql(s"DROP TABLE IF EXISTS ${tableName}_stats_stage")
    ()
  }

  /** Physical COMPACTION of a tombstoned [[writeBm25IndexIncr]] index:
    * rewrite the surviving posting rows through a stage table (Spark
    * cannot overwrite a table that is an input of the writing plan),
    * RECOMPUTE the stats table from the survivors, drop the tombstone
    * table. The stats recompute is bit-equal to the delete-time folds
    * when those completed (all long arithmetic over the same rows), and
    * it REPAIRS the one crash window [[deleteFromBm25Index]] has — a death
    * between its tombstone append and stats swap — so compaction doubles
    * as the documented recovery procedure. Paid on a storage-reclaim
    * schedule, never per delete batch. No-op when nothing is tombstoned. */
  def compactBm25Index(sp: org.apache.spark.sql.SparkSession,
      tableName: String): Unit = {
    if (!sp.catalog.tableExists(s"${tableName}_tombstones")) return
    val spec = sp.sessionState.catalog.getTableMetadata(
      org.apache.spark.sql.catalyst.TableIdentifier(tableName)).bucketSpec
    require(spec.nonEmpty, s"$tableName is not a bucketed index table")
    val nBuckets = spec.get.numBuckets
    val t = sp.table(s"${tableName}_tombstones").select("id").distinct()
    val survivors = sp.table(tableName).join(broadcast(t), Seq("id"), "left_anti")
    graft.sources.ManagedTables.clearOrphanedLocation(sp, s"${tableName}_stage")
    survivors.write.format("parquet")
      .bucketBy(nBuckets, "term").sortBy("term")
      .mode("overwrite").saveAsTable(s"${tableName}_stage")
    graft.sources.ManagedTables.clearOrphanedLocation(sp, tableName)
    sp.table(s"${tableName}_stage")
      .write.format("parquet")
      .bucketBy(nBuckets, "term").sortBy("term")
      .mode("overwrite").saveAsTable(tableName)
    sp.sql(s"DROP TABLE IF EXISTS ${tableName}_stage")
    // exact stats from the compacted postings: per-term df, plus the
    // (term=null, n, sumdl) sentinel — same shape writeBm25IndexIncr emits
    val post = sp.table(tableName)
    val sent = post.agg(
      countDistinct(col("id")).as("n"),
      coalesce(sum("tf"), lit(0L)).as("sumdl")).head()
    val stats = post.groupBy("term").agg(count(lit(1)).as("df"))
      .select(col("term"), col("df"),
        lit(null).cast("long").as("n"), lit(null).cast("long").as("sumdl"))
      .unionByName(sp.range(1).select(
        lit(null).cast("string").as("term"), lit(null).cast("long").as("df"),
        lit(sent.getLong(0)).as("n"), lit(sent.getLong(1)).as("sumdl")))
    graft.sources.ManagedTables.clearOrphanedLocation(sp, s"${tableName}_stats_stage")
    stats.write.format("parquet")
      .bucketBy(nBuckets, "term").sortBy("term")
      .mode("overwrite").saveAsTable(s"${tableName}_stats_stage")
    graft.sources.ManagedTables.clearOrphanedLocation(sp, s"${tableName}_stats")
    sp.table(s"${tableName}_stats_stage")
      .write.format("parquet")
      .bucketBy(nBuckets, "term").sortBy("term")
      .mode("overwrite").saveAsTable(s"${tableName}_stats")
    sp.sql(s"DROP TABLE IF EXISTS ${tableName}_stats_stage")
    sp.sql(s"DROP TABLE IF EXISTS ${tableName}_tombstones")
    ()
  }

  /** BM25 top-`k` against a [[writeBm25IndexIncr]] index — bit-identical
    * to [[bm25AgainstIndex]] / [[bm25TopK]] over the same corpus: the df
    * join is co-located (both tables bucketed by term), the corpus
    * constants come from the stats sentinel, and the contribution math is
    * shared, so scores agree to the bit. Tombstoned ids
    * ([[deleteFromBm25Index]]) are masked by a broadcast anti-join. */
  def bm25AgainstIndexIncr(queries: DataFrame, qidCol: String,
      qtextCol: String, tableName: String, k: Int,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(k >= 1, s"bm25AgainstIndexIncr requires k >= 1, got $k")
    val sp = queries.sparkSession
    val stats = sp.table(s"${tableName}_stats")
    val sent = stats.where(col("term").isNull).select("n", "sumdl").head()
    val n = sent.getLong(0)
    val avgdl = sent.getLong(1).toDouble / n
    val base = sp.table(tableName)
    val live =
      if (sp.catalog.tableExists(s"${tableName}_tombstones"))
        base.join(broadcast(
          sp.table(s"${tableName}_tombstones").select("id").distinct()),
          Seq("id"), "left_anti")
      else base
    val postings = live
      .join(stats.where(col("term").isNotNull).select("term", "df"), "term")
      .select(col("term"), col("id"),
        (round(bm25Contrib(lit(n), lit(avgdl), k1, b), 6)
          .cast(DecimalType(18, 6)) * 1000000).cast("long").as("c"))
    val matched = broadcast(bm25QueryTerms(queries, qidCol, qtextCol))
      .join(postings, "term")
      .select(col("qid"), col("id"), col("c"))
    bm25SumAndRank(matched, k)
  }

  /** BM25 top-`k` against a [[writeBm25Index]] table — bit-identical to
    * [[bm25TopK]] over the same corpus (same float op order; the corpus
    * constants ride the catalog metadata). Rejects tables that are not
    * graft BM25 indexes at plan time. */
  def bm25AgainstIndex(queries: DataFrame, qidCol: String, qtextCol: String,
      tableName: String, k: Int, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(k >= 1, s"bm25AgainstIndex requires k >= 1, got $k")
    val idx = queries.sparkSession.table(tableName)
    val m = idx.schema("term").metadata
    require(m.contains("graft.n") && m.contains("graft.sumdl"),
      s"table $tableName was not written by writeBm25Index (missing corpus stats)")
    val n = m.getLong("graft.n")
    val avgdl = m.getLong("graft.sumdl").toDouble / n
    // same posting-side contribution as bm25TopK (query-independent)
    val postings = idx.select(col("term"), col("id"),
      (round(bm25Contrib(lit(n), lit(avgdl), k1, b), 6)
        .cast(DecimalType(18, 6)) * 1000000).cast("long").as("c"))
    val matched = broadcast(bm25QueryTerms(queries, qidCol, qtextCol))
      .join(postings, "term")
      .select(col("qid"), col("id"), col("c"))
    bm25SumAndRank(matched, k)
  }

  /** Distinct lowercase query terms: (qid, term). */
  private def bm25QueryTerms(queries: DataFrame, qidCol: String,
      qtextCol: String): DataFrame =
    queries.select(col(qidCol).cast("long").as("qid"),
      explode(array_distinct(TextFunctions.tokens(lower(col(qtextCol))))).as("term"))

  /** Per-(query, doc, term) BM25 contribution over posting columns
    * `tf`/`df`/`dl`; float op order mirrors the SQL replay exactly:
    * (1-b) is a plan-time constant, b*dl divides by avgdl left-to-right. */
  private def bm25Contrib(nCol: Column, avgdlCol: Column,
      k1: Double, b: Double): Column =
    (log(lit(1.0) + (nCol - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
      * (col("tf") * lit(k1 + 1.0))
      / (col("tf") + lit(k1) * (lit(1.0 - b) + (lit(b) * col("dl")) / avgdlCol)))

  /** Sum the posting-side contributions — carried as LONG MICRO-UNITS
    * (the 6 dp rounding scaled exactly through DECIMAL, so the hot
    * (qid, doc) aggregate is a primitive long sum instead of decimal
    * machinery; a 44 M-match probe at 16× sf0.1 spends its time right
    * here). Order-exact under any partitioning like the decimal it
    * replaces (the q132 discipline), map-side combining, and the final
    * `micros.toDouble / 1e6` is the correctly-rounded K/1e6 — the same
    * double the decimal cast produced, so oracles are unchanged. Then
    * rank per query (ties by doc id) and keep the top k. */
  private def bm25SumAndRank(matched: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy("qid").orderBy(col("score").desc, col("doc_id"))
    matched.groupBy("qid", "id")
      .agg(sum(col("c")).as("__s"))
      .select(col("qid"), col("id").as("doc_id"),
        (col("__s").cast("double") / lit(1e6)).as("score"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
  }

  /** Reciprocal-rank fusion (Cormack et al., SIGIR '09) of two rank lists
    * over the same (query, item) id space — the standard way to combine a
    * lexical ranker (BM25) with a vector ranker into one hybrid retrieval
    * result: `rrf = 1/(c + rank_a) + 1/(c + rank_b)`, a list an item is
    * missing from contributes 0. Rank-based, so the two rankers' score
    * scales never need calibrating; the two-term sum has a fixed addition
    * order and rounds to 6 dp, so a SQL oracle replays it exactly. Ties
    * break by item id; output re-ranked and cut to `k`.
    *
    * Scale shape: one full-outer equi-join on (query, item) — both inputs
    * are already top-k-per-query lists, so the join is k-bounded per query
    * — then the same WindowGroupLimit top-k as every ranker here. */
  def rrfFuse(a: DataFrame, b: DataFrame, qCol: String, idCol: String,
      rankCol: String, k: Int, c: Int = 60): DataFrame = {
    require(k >= 1, s"rrfFuse requires k >= 1, got $k")
    require(c >= 0, s"rrfFuse requires c >= 0, got $c")
    val aa = a.select(col(qCol), col(idCol), col(rankCol).as("__ra"))
    val bb = b.select(col(qCol), col(idCol), col(rankCol).as("__rb"))
    val rrf = round(
      coalesce(lit(1.0) / (lit(c.toDouble) + col("__ra").cast("double")), lit(0.0)) +
      coalesce(lit(1.0) / (lit(c.toDouble) + col("__rb").cast("double")), lit(0.0)), 6)
    val w = Window.partitionBy(qCol).orderBy(col("rrf").desc, col(idCol))
    aa.join(bb, Seq(qCol, idCol), "full_outer")
      .withColumn("rrf", rrf)
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select(col(qCol), col(idCol), col("rrf"), col("rank"))
  }
}
