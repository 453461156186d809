package graft

import org.apache.spark.sql.functions._
import graft.functions.TfIdf

/** BM25 retrieval: checked against an independent plain-Scala reference
  * (same tokenization, same k1/b), plus ranking/shape properties. */
class Bm25Spec extends SparkSuite {
  import spark.implicits._

  private val corpus = Seq(
    1L -> "the quick brown fox jumps over the lazy dog",
    2L -> "the lazy dog sleeps all day long in the sun",
    3L -> "quick quick quick repetition of the word quick",
    4L -> "an entirely unrelated document about spark plans",
    5L -> "brown foxes and brown bears share the brown woods")

  private val queries = Seq(10L -> "quick brown fox", 20L -> "lazy dog")

  /** Plain-Scala BM25 with the exact contract: lowercase whitespace tokens,
    * distinct query terms, idf = ln(1 + (N - df + .5)/(df + .5)), each
    * contribution rounded to 6 dp then summed exactly (decimal — the
    * operator's order-exact DECIMAL(18,6) discipline). */
  private def reference(k1: Double, b: Double): Map[(Long, Long), Double] = {
    def toks(s: String) = s.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
    val docToks = corpus.map { case (id, t) => id -> toks(t) }.toMap
    val n = corpus.size
    val avgdl = docToks.values.map(_.size).sum.toDouble / n
    val df = docToks.values.flatMap(_.distinct).groupBy(identity).map {
      case (t, xs) => t -> xs.size
    }
    val out = for {
      (qid, qt) <- queries
      (id, dt) <- docToks
      contribs = qt.split("\\s+").filter(_.nonEmpty).distinct.sorted.toSeq.flatMap { term =>
        val tf = dt.count(_ == term)
        if (tf == 0) None
        else {
          val idf = math.log(1.0 + (n - df(term) + 0.5) / (df(term) + 0.5))
          Some(idf * (tf * (k1 + 1.0)) /
            (tf + k1 * ((1.0 - b) + (b * dt.size) / avgdl)))
        }
      }
      if contribs.nonEmpty
      score = contribs.map(c => BigDecimal(c)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP)).sum.toDouble
    } yield (qid, id) -> score
    out.toMap
  }

  private def run(k: Int, k1: Double = 1.2, b: Double = 0.75) =
    TfIdf.bm25TopK(corpus.toDF("doc_id", "text"), "doc_id", "text",
      queries.toDF("qid", "qtext"), "qid", "qtext", k, k1, b)

  test("scores match the independent reference exactly (default k1/b)") {
    val got = run(k = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(got == reference(1.2, 0.75))
  }

  test("non-default k1/b also match (parameters actually thread through)") {
    val got = run(k = 10, k1 = 2.0, b = 0.3).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(got == reference(2.0, 0.3))
  }

  test("ranks are dense 1..n per query, ordered by (score desc, doc_id)") {
    val rows = run(k = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    rows.groupBy(_._1).foreach { case (_, g) =>
      val sorted = g.sortBy(_._4)
      assert(sorted.map(_._4).toSeq == (1L to g.length).toSeq)
      assert(sorted.sameElements(g.sortBy(x => (-x._3, x._2))))
    }
  }

  test("k bounds the rows per query") {
    val rows = run(k = 1).collect()
    assert(rows.groupBy(_.getLong(0)).values.forall(_.length == 1))
    // the top hit for "quick brown fox" must contain at least one query term
    val top10 = rows.find(_.getLong(0) == 10L).get.getLong(1)
    assert(Set(1L, 3L, 5L).contains(top10))
  }

  test("docs sharing no query term never appear") {
    assert(!run(k = 10).collect().exists(r =>
      r.getLong(0) == 20L && r.getLong(1) == 4L))
  }

  test("result is invariant to input partitioning") {
    val a = run(k = 10).collect().map(_.toSeq).toSet
    val shuffled = TfIdf.bm25TopK(
      corpus.toDF("doc_id", "text").repartition(7), "doc_id", "text",
      queries.toDF("qid", "qtext").repartition(3), "qid", "qtext", 10)
    assert(shuffled.collect().map(_.toSeq).toSet == a)
  }

  test("persisted index probe == direct path bit for bit; layout is bucketed") {
    val prevThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      TfIdf.writeBm25Index(corpus.toDF("doc_id", "text"), "doc_id", "text",
        "graft_bm25_spec_idx", nBuckets = 4)
      val direct = run(k = 10).collect().map(_.toSeq).toSet
      val viaIdx = TfIdf.bm25AgainstIndex(queries.toDF("qid", "qtext"),
        "qid", "qtext", "graft_bm25_spec_idx", 10)
      assert(viaIdx.collect().map(_.toSeq).toSet == direct)
      // big-query-workload path: with broadcast off, the term-bucketed index
      // side of the sort-merge join must read in place — no Exchange over it
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val plan = TfIdf.bm25AgainstIndex(queries.toDF("qid", "qtext"),
        "qid", "qtext", "graft_bm25_spec_idx", 10)
        .queryExecution.executedPlan.toString
      assert(plan.contains("Bucketed: true"), s"index scan must use buckets:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThresh)
      spark.sql("DROP TABLE IF EXISTS graft_bm25_spec_idx")
    }
  }

  test("incremental BM25 index: two-step build == one-shot == classic index, df join adds no exchange") {
    val prevThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val docs = corpus.toDF("doc_id", "text")
    try {
      // blind append (no index) rejected
      val e0 = intercept[IllegalArgumentException] {
        TfIdf.appendToBm25Index(docs, "doc_id", "text", "graft_bm25_incr_spec")
      }
      assert(e0.getMessage.contains("no incremental BM25 index"))
      // two-step: odd docs first, evens appended
      TfIdf.writeBm25IndexIncr(docs.where(col("doc_id") % 2 === 1),
        "doc_id", "text", "graft_bm25_incr_spec", nBuckets = 4)
      TfIdf.appendToBm25Index(docs.where(col("doc_id") % 2 === 0),
        "doc_id", "text", "graft_bm25_incr_spec")
      // one-shot incremental layout over the full corpus
      TfIdf.writeBm25IndexIncr(docs, "doc_id", "text",
        "graft_bm25_incr_one", nBuckets = 4)
      val q = queries.toDF("qid", "qtext")
      val twoStep = TfIdf.bm25AgainstIndexIncr(q, "qid", "qtext",
        "graft_bm25_incr_spec", 10).collect().map(_.toSeq).toSet
      val oneShot = TfIdf.bm25AgainstIndexIncr(q, "qid", "qtext",
        "graft_bm25_incr_one", 10).collect().map(_.toSeq).toSet
      val direct = run(k = 10).collect().map(_.toSeq).toSet
      assert(twoStep.nonEmpty && twoStep == oneShot && twoStep == direct,
        "append must fold df/n/sumdl so scores stay bit-identical")
      // the split-out df join must be co-located: with broadcast off, the
      // incremental probe plans NO MORE exchanges than the classic
      // embedded-df probe over the same corpus
      TfIdf.writeBm25Index(docs, "doc_id", "text", "graft_bm25_incr_cls",
        nBuckets = 4)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      def exchanges(plan: String) = "Exchange".r.findAllIn(plan).size
      val pIncr = TfIdf.bm25AgainstIndexIncr(q, "qid", "qtext",
        "graft_bm25_incr_spec", 10).queryExecution.executedPlan.toString
      val pCls = TfIdf.bm25AgainstIndex(q, "qid", "qtext",
        "graft_bm25_incr_cls", 10).queryExecution.executedPlan.toString
      assert(pIncr.contains("Bucketed: true"), s"postings must scan bucketed:\n$pIncr")
      assert(exchanges(pIncr) <= exchanges(pCls),
        s"df join must not add a shuffle: incr=${exchanges(pIncr)} classic=${exchanges(pCls)}")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThresh)
      Seq("graft_bm25_incr_spec", "graft_bm25_incr_spec_stats",
        "graft_bm25_incr_one", "graft_bm25_incr_one_stats",
        "graft_bm25_incr_cls", "graft_bm25_incr_spec_stats_stage")
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    }
  }

  test("BM25 tombstone delete == rebuild over survivors bit-exactly; compaction preserves") {
    val docs = corpus.toDF("doc_id", "text")
    val dead = docs.where(col("doc_id") % 2 === 0).select("doc_id") // 2, 4
    val live = docs.where(col("doc_id") % 2 === 1)
    val q = queries.toDF("qid", "qtext")
    try {
      // deleting from a missing index is rejected
      val e0 = intercept[IllegalArgumentException] {
        TfIdf.deleteFromBm25Index(dead, "doc_id", "graft_bm25_del_spec")
      }
      assert(e0.getMessage.contains("no incremental BM25 index"))
      TfIdf.writeBm25IndexIncr(docs, "doc_id", "text",
        "graft_bm25_del_spec", nBuckets = 4)
      TfIdf.writeBm25IndexIncr(live, "doc_id", "text",
        "graft_bm25_del_surv", nBuckets = 4)
      def probe(t: String) = TfIdf.bm25AgainstIndexIncr(q, "qid", "qtext", t, 10)
        .collect().map(_.toSeq).toSet
      val full = probe("graft_bm25_del_spec")
      TfIdf.deleteFromBm25Index(dead, "doc_id", "graft_bm25_del_spec")
      val afterDelete = probe("graft_bm25_del_spec")
      val rebuilt = probe("graft_bm25_del_surv")
      assert(afterDelete.nonEmpty && afterDelete == rebuilt,
        "delete must fold df/n/sumdl down so scores rebuild bit-identically")
      assert(full != afterDelete, "the delete must change scores (df/n moved)")
      // stats sentinel folded down to the survivor corpus exactly
      val sent = spark.table("graft_bm25_del_spec_stats")
        .where(col("term").isNull).select("n", "sumdl").head()
      val sentS = spark.table("graft_bm25_del_surv_stats")
        .where(col("term").isNull).select("n", "sumdl").head()
      assert(sent == sentS)
      // a term whose docs all died leaves the lexicon, as a rebuild would
      val terms = spark.table("graft_bm25_del_spec_stats")
        .where(col("term").isNotNull).select("term", "df")
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val termsS = spark.table("graft_bm25_del_surv_stats")
        .where(col("term").isNotNull).select("term", "df")
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(terms == termsS)
      // deleting an id the index never held is a no-op on every statistic
      TfIdf.deleteFromBm25Index(Seq(999L).toDF("doc_id"), "doc_id",
        "graft_bm25_del_spec")
      assert(probe("graft_bm25_del_spec") == rebuilt)
      assert(spark.table("graft_bm25_del_spec_stats")
        .where(col("term").isNull).select("n", "sumdl").head() == sentS)
      // RE-deleting an already-tombstoned id is a no-op (idempotency:
      // the dead ids' postings are still physically present until
      // compaction, so without the tombstone anti-join this would
      // double-decrement df/n/sumdl)
      TfIdf.deleteFromBm25Index(dead, "doc_id", "graft_bm25_del_spec")
      assert(probe("graft_bm25_del_spec") == rebuilt,
        "re-delete of tombstoned ids must not change scores")
      assert(spark.table("graft_bm25_del_spec_stats")
        .where(col("term").isNull).select("n", "sumdl").head() == sentS,
        "re-delete must not double-decrement the stats sentinel")
      // compaction: postings shrink to the survivor rebuild's row count,
      // tombstones drop, probe unchanged, bucket layout preserved
      TfIdf.compactBm25Index(spark, "graft_bm25_del_spec")
      assert(!spark.catalog.tableExists("graft_bm25_del_spec_tombstones"))
      assert(spark.table("graft_bm25_del_spec").count() ==
        spark.table("graft_bm25_del_surv").count())
      assert(probe("graft_bm25_del_spec") == rebuilt)
      val prevThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      try {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        val plan = TfIdf.bm25AgainstIndexIncr(q, "qid", "qtext",
          "graft_bm25_del_spec", 10).queryExecution.executedPlan.toString
        assert(plan.contains("Bucketed: true"),
          s"compacted postings must still scan bucketed:\n$plan")
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThresh)
      // compacting with nothing tombstoned is a no-op
      TfIdf.compactBm25Index(spark, "graft_bm25_del_spec")
      assert(probe("graft_bm25_del_spec") == rebuilt)
      // crash repair: tombstones landed but the stats fold never ran (the
      // delete's one crash window — tombstones append first, stats swap
      // second). Compaction recomputes stats from the survivors exactly.
      TfIdf.writeBm25IndexIncr(docs, "doc_id", "text",
        "graft_bm25_del_crash", nBuckets = 4)
      graft.sources.ManagedTables.clearOrphanedLocation(
        spark, "graft_bm25_del_crash_tombstones")
      dead.select(col("doc_id").cast("long").as("id"))
        .write.format("parquet").mode("append")
        .saveAsTable("graft_bm25_del_crash_tombstones")
      TfIdf.compactBm25Index(spark, "graft_bm25_del_crash")
      assert(probe("graft_bm25_del_crash") == rebuilt,
        "compaction must repair a crash-stale stats table")
      assert(spark.table("graft_bm25_del_crash_stats")
        .where(col("term").isNull).select("n", "sumdl").head() == sentS)
    } finally {
      Seq("graft_bm25_del_spec", "graft_bm25_del_spec_stats",
        "graft_bm25_del_spec_tombstones", "graft_bm25_del_spec_stage",
        "graft_bm25_del_spec_stats_stage",
        "graft_bm25_del_crash", "graft_bm25_del_crash_stats",
        "graft_bm25_del_crash_tombstones", "graft_bm25_del_crash_stage",
        "graft_bm25_del_crash_stats_stage",
        "graft_bm25_del_surv", "graft_bm25_del_surv_stats")
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    }
  }

  test("an orphaned warehouse location from a dead JVM does not block index writes") {
    // in-memory catalogs forget tables at JVM exit; warehouse dirs don't —
    // a rerun must clear the catalog-orphaned location, not die on
    // LOCATION_ALREADY_EXISTS (this bit Verify-then-test sequences)
    val wh = spark.conf.get("spark.sql.warehouse.dir")
    val p = new org.apache.hadoop.fs.Path(wh, "graft_bm25_orphan_idx")
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    fs.mkdirs(new org.apache.hadoop.fs.Path(p, "stale-part"))
    try {
      TfIdf.writeBm25Index(corpus.toDF("doc_id", "text"), "doc_id", "text",
        "graft_bm25_orphan_idx", nBuckets = 2)
      assert(spark.catalog.tableExists("graft_bm25_orphan_idx"))
      val viaIdx = TfIdf.bm25AgainstIndex(queries.toDF("qid", "qtext"),
        "qid", "qtext", "graft_bm25_orphan_idx", 10)
      assert(viaIdx.count() > 0)
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_bm25_orphan_idx")
    }
  }

  test("probing a non-index table is rejected at plan time") {
    try {
      corpus.toDF("term", "text").write.mode("overwrite")
        .saveAsTable("graft_bm25_not_idx")
      val e = intercept[IllegalArgumentException] {
        TfIdf.bm25AgainstIndex(queries.toDF("qid", "qtext"),
          "qid", "qtext", "graft_bm25_not_idx", 10)
      }
      assert(e.getMessage.contains("writeBm25Index"))
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_bm25_not_idx")
    }
  }

  test("rrfFuse: closed-form fusion, single-list items, tie-break, k cut") {
    import spark.implicits._
    def rrf(rs: Int*): Double =
      BigDecimal(rs.map(r => 1.0 / (60 + r)).sum)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // query 1: doc 10 ranks 1 in A and 2 in B; doc 11 only in A (rank 2);
    // doc 12 only in B (rank 1)
    val a = Seq((1L, 10L, 1L), (1L, 11L, 2L)).toDF("qid", "doc_id", "rank")
    val b = Seq((1L, 10L, 2L), (1L, 12L, 1L)).toDF("qid", "doc_id", "rank")
    val got = TfIdf.rrfFuse(a, b, "qid", "doc_id", "rank", 10)
      .collect().map(r => (r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
    assert(got == Set(
      (10L, rrf(1, 2), 1L),   // in both lists -> highest fused score
      (12L, rrf(1), 2L),      // 1/61 > 1/62: B's top beats A's second
      (11L, rrf(2), 3L)))
    // equal fused scores tie-break by item id; k cuts the fused list
    val a2 = Seq((1L, 20L, 1L), (1L, 21L, 1L)).toDF("qid", "doc_id", "rank")
    val b2 = Seq((1L, 99L, 9L)).toDF("qid", "doc_id", "rank")
    val t = TfIdf.rrfFuse(a2, b2, "qid", "doc_id", "rank", 2)
      .collect().map(r => (r.getLong(1), r.getLong(3))).toSet
    assert(t == Set((20L, 1L), (21L, 2L))) // 99 cut by k=2
  }

  test("datasetStamp fingerprints content: in-place overwrite with preserved mtime changes the stamp") {
    // the q64/q78 session caches key on this stamp; max-mtime alone would
    // serve a stale index when a dataset is overwritten in place with the
    // same timestamps — the (name, length, mtime) fold must still change
    val dir = java.nio.file.Files.createTempDirectory("graft_stamp").toFile
    try {
      val pq = new java.io.File(dir, "documents.parquet")
      assert(pq.mkdirs())
      val part = new java.io.File(pq, "part-00000.parquet")
      java.nio.file.Files.write(part.toPath, "aaaa".getBytes)
      part.setLastModified(1700000000000L)
      val s1 = SparkEntry.datasetStamp(dir.getPath)
      assert(s1 == SparkEntry.datasetStamp(dir.getPath)) // deterministic
      // same mtime, different length -> different stamp
      java.nio.file.Files.write(part.toPath, "aaaaaa".getBytes)
      part.setLastModified(1700000000000L)
      val s2 = SparkEntry.datasetStamp(dir.getPath)
      assert(s1 != s2, "content change with preserved mtime must change the stamp")
      // extra part file (same total layout otherwise) -> different stamp
      val part2 = new java.io.File(pq, "part-00001.parquet")
      java.nio.file.Files.write(part2.toPath, "bb".getBytes)
      part2.setLastModified(1700000000000L)
      assert(SparkEntry.datasetStamp(dir.getPath) != s2)
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(dir)
    }
  }
}
