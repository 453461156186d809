package graft

import org.apache.spark.sql.functions._
import graft.functions.Similarity
import graft.multimodal.Multimodal

class SimilaritySpec extends SparkSuite {
  import spark.implicits._

  lazy val vecs = {
    val rng = new scala.util.Random(3L)
    val base = Array.fill(16)(rng.nextGaussian().toFloat)
    val nearBase = base.zipWithIndex.map { case (v, i) => if (i == 0) v + 0.01f else v }
    val rows = Seq(
      (0L, base), (1L, nearBase),
      (2L, base.map(-_))) ++ (3L until 40L).map(i =>
      (i, Array.fill(16)(rng.nextGaussian().toFloat)))
    rows.toDF("vec_id", "embedding")
  }

  test("native dot_product == interpreted HOF fold, bit for bit") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").limit(100)
    val q = e.select(col("vec_id").as("qid"), col("embedding").as("qv")).limit(5)
    val pairs = e.crossJoin(broadcast(q))
      .select(
        Similarity.dot(col("embedding").cast("array<double>"), col("qv").cast("array<double>")).as("fast"),
        Similarity.dotHof(col("embedding").cast("array<double>"), col("qv").cast("array<double>")).as("slow"))
    assert(pairs.where(col("fast") =!= col("slow")).count() == 0)
    // and it participates in whole-stage codegen (HOFs never do)
    val plan = pairs.queryExecution.executedPlan.toString
    assert(plan.contains("dotproduct") || plan.contains("DotProduct") || !plan.contains("CodegenFallback"))
  }

  test("SQL registration via SparkSessionExtensions builders") {
    import graft.expressions.GraftExtensions
    GraftExtensions.functions.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name, exprs => builder(exprs), "scala_udf")
    }
    val r = spark.sql(
      """SELECT dot_product(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d,
        |       interval_overlaps(named_struct('start', 0L, 'stop', 5L),
        |                         named_struct('start', 4L, 'stop', 9L)) AS o,
        |       interval_intersect(named_struct('start', 0L, 'stop', 5L),
        |                          named_struct('start', 4L, 'stop', 9L)).start AS is0
        |""".stripMargin).head
    assert(r.getDouble(0) == 11.0)
    assert(r.getBoolean(1))
    assert(r.getLong(2) == 4L)
    // lifted Column-path functions: SQL values == Scala-API values
    val txt = "the quick brown fox"
    val sqlRow = spark.sql(
      s"""SELECT token_count('$txt') AS tc, lang_id('$txt') AS lg,
         |       simhash32('$txt') AS sh,
         |       interval_duration(named_struct('start', 3L, 'stop', 10L)) AS d
         |""".stripMargin).head
    import graft.functions.{Dedup, TextFunctions => TF}
    val apiRow = spark.range(1)
      .select(TF.tokenCount(lit(txt)), TF.langId(lit(txt)), Dedup.simhash32(lit(txt))).head
    assert(sqlRow.getInt(0) == apiRow.getInt(0) && sqlRow.getInt(0) == 4)
    assert(sqlRow.getString(1) == apiRow.getString(1))
    assert(sqlRow.getLong(2) == apiRow.getLong(2))
    assert(sqlRow.getLong(3) == 7L)
    // SQL == Scala on the edge cases: a reversed (degenerate) interval is
    // the empty set and overlaps nothing, and a NULL operand yields a NULL
    // intersection (not a greatest/least NULL-skipping struct)
    val edge = spark.sql(
      """SELECT interval_overlaps(named_struct('start', 9L, 'stop', 0L),
        |                         named_struct('start', 1L, 'stop', 5L)) AS rev,
        |       interval_overlaps(named_struct('start', 3L, 'stop', 3L),
        |                         named_struct('start', 1L, 'stop', 5L)) AS empt,
        |       interval_intersect(CAST(NULL AS struct<start:bigint,stop:bigint>),
        |                          named_struct('start', 1L, 'stop', 5L)) AS ni
        |""".stripMargin).head
    assert(!edge.getBoolean(0) && !edge.getBoolean(1) && edge.isNullAt(2))
    val scalaEdge = spark.range(1).select(
      graft.intervals.IntervalCols.overlaps(
        struct(lit(9L).as("start"), lit(0L).as("stop")),
        struct(lit(1L).as("start"), lit(5L).as("stop")))).head
    assert(!scalaEdge.getBoolean(0))
    // wrong arity fails analysis with a clear message (extra args would
    // otherwise be silently ignored)
    val err = intercept[Exception] {
      spark.sql("SELECT token_count('a', 'b')").head
    }
    assert(err.getMessage.contains("token_count expects 1 argument"), err.getMessage)
  }

  test("cosine: self=1, opposite=-1") {
    val r = vecs.where(col("vec_id") === 0)
      .select(Similarity.cosine(col("embedding"), col("embedding"))).head.getDouble(0)
    assert(math.abs(r - 1.0) < 1e-12)
  }

  test("brute-force top-k: nearest of the base vector is its perturbed copy") {
    val q = vecs.where(col("vec_id") === 0)
    val top = Similarity.bruteForceTopK(vecs, q, 3).orderBy("rank").collect()
    assert(top.length == 3)
    assert(top.head.getLong(1) == 1L)   // vec_id of rank 1
    assert(top.head.getDouble(2) > 0.999)
    // and the opposite vector ranks dead last overall
    val all = Similarity.bruteForceTopK(vecs, q, 100).count()
    assert(all == vecs.count() - 1)
  }

  test("LSH top-k: same-bucket results agree with brute-force ranking restricted to the bucket") {
    val planes = Similarity.randomPlanes(6, 16)
    val q = vecs.where(col("vec_id") === 0)
    val lsh = Similarity.lshTopK(vecs, q, 5, planes).collect()
    assert(lsh.nonEmpty)
    // identical-direction near-dup lands in the same bucket -> rank 1
    assert(lsh.head.getLong(1) == 1L)
    // recall proxy: every LSH hit must also be a brute-force neighbour
    val brute = Similarity.bruteForceTopK(vecs, q, 100)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(lsh.map(_.getLong(1)).forall(brute.contains))
  }

  test("IVF: bucketed search finds the planted neighbour; recall vs brute force is sane") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = e.where(col("vec_id") % 100 === 0)
    val index = Similarity.ivfTrain(e, nLists = 8)
    assert(index.nLists == 8)
    val ivf = Similarity.ivfTopK(e, q, 10, index, nProbe = 3)
      .select("q_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = Similarity.bruteForceTopK(e, q, 10)
      .select("q_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(ivf.nonEmpty)
    // every IVF hit is a real vector pair; recall over the true top-10 is
    // decent with 3/8 lists probed on random data
    val recall = (ivf & brute).size.toDouble / brute.size
    assert(recall > 0.2, s"recall=$recall")
    // and probing ALL lists must reproduce brute force exactly
    val full = Similarity.ivfTopK(e, q, 10, index, nProbe = 8)
      .select("q_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(full == brute)
  }

  test("IVF at the q61 operating point (nProbe 4 of 16): recall vs brute force holds") {
    // Pins the approximate regime the bench runs (q61_ann_ivf_probe has no
    // exact SQL oracle — centroid-dependent results): same data, same
    // nLists/nProbe, recall over the true top-10 must stay useful.
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = e.where(col("vec_id") % 100 === 0)
    val ivf = Similarity.ivfTopK(e, q, 10, Similarity.ivfTrain(e, nLists = 16), nProbe = 4)
      .select("q_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = Similarity.bruteForceTopK(e, q, 10)
      .select("q_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (ivf & brute).size.toDouble / brute.size
    assert(recall > 0.2, s"recall=$recall")
    // per query, at most k results and every one a real corpus vector
    val perQ = Similarity.ivfTopK(e, q, 10, Similarity.ivfTrain(e, nLists = 16), nProbe = 4)
      .groupBy("q_id").count().collect()
    assert(perQ.forall(_.getLong(1) <= 10))
  }

  test("IVF corpus-scaled operating point: nLists grows with the corpus, recall and candidate work hold") {
    // The production regime the q181 oracle row cannot replay: when the
    // corpus grows, the coarse quantizer retrains with nLists ∝ corpus so
    // corpus/nLists — hence per-query candidate work — stays ~flat at the
    // SAME nProbe. 4× the fixture (id-offset copies, the ScaleUpBench
    // shape), 4× the lists, identical queries.
    val e1 = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id").cast("long").as("vec_id"), col("embedding"))
    val e4 = (0 until 4).map(c =>
        e1.select((col("vec_id") + c * 100000000L).as("vec_id"), col("embedding")))
      .reduce(_ unionByName _)
    val q = e1.where(col("vec_id") % 100 === 0)
    val nProbe = 4
    def cands(e: org.apache.spark.sql.DataFrame, nLists: Int): (Long, Set[(Long, Long)]) = {
      val index = Similarity.ivfTrain(e, nLists = nLists)
      val n = e.withColumn("list_id", Similarity.ivfListId(col("embedding"), index))
        .join(q.select(col("vec_id").as("q_id"),
          explode(Similarity.ivfProbeLists(col("embedding"), index, nProbe))
            .as("list_id")), Seq("list_id"))
        .count()
      val hits = Similarity.ivfTopK(e, q, 10, index, nProbe = nProbe)
        .select("q_id", "vec_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      (n, hits)
    }
    val (c1, hits1) = cands(e1, 16)
    val (c4, hits4) = cands(e4, 64)
    // candidate work per query stays ~flat (k-means balance is imperfect;
    // 2.5x headroom vs the 4x a fixed-nLists quantizer would pay)
    assert(c4.toDouble / c1 < 2.5,
      s"scaled-nLists candidate work grew ${c4.toDouble / c1}x for 4x corpus")
    // recall at each scale against THAT scale's own brute-force truth
    // (a 4x top-10 is dominated by the 4 copies of the top few vectors,
    // so folding 4x hits onto the 1x truth would cap recall near 0.3
    // even for a PERFECT search)
    val brute1 = Similarity.bruteForceTopK(e1, q, 10)
      .select("q_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute4 = Similarity.bruteForceTopK(e4, q, 10)
      .select("q_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val r1 = (hits1 & brute1).size.toDouble / brute1.size
    val r4 = (hits4 & brute4).size.toDouble / brute4.size
    assert(r1 > 0.2, s"1x recall=$r1")
    assert(r4 > 0.2, s"4x scaled-nLists recall=$r4")
  }

  test("anchored IVF: full probe == brute force; q61 operating point recall holds") {
    // q61's quantizer: deterministic hashAnchors (SQL-replayable). At
    // nProbe == anchors.length every cell is probed, so the result must
    // EQUAL brute force bit for bit; at the approximate operating point
    // (nProbe 4 of 16) recall over the true top-10 must stay useful.
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = e.where(col("vec_id") % 100 === 0)
    val anchors = Similarity.hashAnchors(e, 16, salt = "q61")
    assertSameRows(
      Similarity.ivfTopKAnchored(e, q, 10, anchors, nProbe = 16),
      Similarity.bruteForceTopK(e, q, 10)
        .select(col("q_id").cast("long").as("q_id"), col("vec_id"),
          col("sim"), col("rank")))
    val got = Similarity.ivfTopKAnchored(e, q, 10, anchors, nProbe = 4)
      .select("q_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = Similarity.bruteForceTopK(e, q, 10)
      .select("q_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (got & brute).size.toDouble / brute.size
    assert(recall > 0.2, s"recall=$recall")
    // probe head == assigned cell: nProbe=1 self-query always finds the
    // query's own cell-mates (the two rules share one ordering)
    intercept[IllegalArgumentException] {
      Similarity.ivfTopKAnchored(e, q, 10, anchors, nProbe = 0)
    }
    intercept[IllegalArgumentException] {
      Similarity.ivfTopKAnchored(e, q, 10, anchors, nProbe = 17)
    }
  }

  test("persisted IVF index probe == direct ivfTopK bit for bit; layout is bucketed") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = e.where(col("vec_id") % 100 === 0)
    val index = Similarity.ivfTrain(e, nLists = 8)
    val prevThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      Similarity.writeIvfIndexTable(e, index, "graft_ivf_spec_idx", nBuckets = 4)
      val direct = Similarity.ivfTopK(e, q, 10, index, nProbe = 3)
        .collect().map(_.toSeq).toSet
      val viaIdx = Similarity.ivfTopKAgainstIndexTable(q, 10,
        "graft_ivf_spec_idx", nProbe = 3)
      assert(viaIdx.collect().map(_.toSeq).toSet == direct)
      // big-query-workload path: broadcastQueries = false must NOT hint the
      // query side into a broadcast (a force-broadcast hint overrides the
      // threshold and could OOM on a huge query batch); the list-bucketed
      // index side then sort-merges in place — no Exchange over it
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val big = Similarity.ivfTopKAgainstIndexTable(q, 10,
        "graft_ivf_spec_idx", nProbe = 3, broadcastQueries = false)
      assert(big.collect().map(_.toSeq).toSet == direct,
        "sort-merge path must return the identical result")
      val plan = big.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastHashJoin"),
        s"broadcastQueries=false must not broadcast the query batch:\n$plan")
      assert(plan.contains("Bucketed: true"), s"index scan must use buckets:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThresh)
      spark.sql("DROP TABLE IF EXISTS graft_ivf_spec_idx")
    }
  }

  test("incremental IVF index: append under the frozen quantizer == rebuild; blind append rejected") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = e.where(col("vec_id") % 100 === 0)
    // the quantizer is trained ONCE on the first batch and frozen — the
    // production contract (ingestion batches must not retrain implicitly)
    val first = e.where(col("vec_id") % 2 === 0)
    val second = e.where(col("vec_id") % 2 === 1)
    val index = Similarity.ivfTrain(first, nLists = 8)
    try {
      val e0 = intercept[IllegalArgumentException] {
        Similarity.appendToIvfIndexTable(second, "graft_ivf_incr_idx")
      }
      assert(e0.getMessage.contains("no IVF index table"))
      Similarity.writeIvfIndexTable(first, index, "graft_ivf_incr_idx", nBuckets = 4)
      Similarity.appendToIvfIndexTable(second, "graft_ivf_incr_idx")
      Similarity.writeIvfIndexTable(e, index, "graft_ivf_full_idx", nBuckets = 4)
      val inc = Similarity.ivfTopKAgainstIndexTable(q, 10,
        "graft_ivf_incr_idx", nProbe = 3).collect().map(_.toSeq).toSet
      val full = Similarity.ivfTopKAgainstIndexTable(q, 10,
        "graft_ivf_full_idx", nProbe = 3).collect().map(_.toSeq).toSet
      assert(inc.nonEmpty && inc == full,
        "append under the frozen quantizer must equal the one-shot rebuild")
      // the merged table still scans bucketed
      val plan = Similarity.ivfTopKAgainstIndexTable(q, 10,
        "graft_ivf_incr_idx", nProbe = 3, broadcastQueries = false)
        .queryExecution.executedPlan.toString
      assert(plan.contains("Bucketed: true"),
        s"appended index must still scan bucketed:\n$plan")
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_ivf_incr_idx")
      spark.sql("DROP TABLE IF EXISTS graft_ivf_full_idx")
    }
  }

  test("IVF tombstone delete == rebuild under the frozen quantizer; compaction preserves") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = e.where(col("vec_id") % 100 === 0)
    val dead = e.where(col("vec_id") % 5 === 3).select("vec_id")
    val survivors = e.where(col("vec_id") % 5 =!= 3)
    // quantizer trained on the FULL corpus and frozen through the delete —
    // the IVF deletion contract (list membership of survivors unchanged)
    val index = Similarity.ivfTrain(e, nLists = 8)
    def probe(t: String) = Similarity.ivfTopKAgainstIndexTable(q, 10, t,
      nProbe = 3).collect().map(_.toSeq).toSet
    try {
      val e0 = intercept[IllegalArgumentException] {
        Similarity.deleteFromIvfIndexTable(dead, "graft_ivf_del_idx")
      }
      assert(e0.getMessage.contains("no IVF index table"))
      Similarity.writeIvfIndexTable(e, index, "graft_ivf_del_idx", nBuckets = 4)
      Similarity.writeIvfIndexTable(survivors, index, "graft_ivf_del_surv",
        nBuckets = 4)
      val full = probe("graft_ivf_del_idx")
      Similarity.deleteFromIvfIndexTable(dead, "graft_ivf_del_idx")
      val afterDelete = probe("graft_ivf_del_idx")
      val rebuilt = probe("graft_ivf_del_surv")
      assert(afterDelete.nonEmpty && afterDelete == rebuilt,
        "tombstoned probe must equal the rebuild over the survivors")
      assert(full != afterDelete, "the delete must evict ranked results")
      // compaction: rows shrink to the rebuild's count, tombstones drop,
      // the frozen centroids survive the rewrite in the schema metadata
      Similarity.compactIvfIndexTable(spark, "graft_ivf_del_idx")
      assert(!spark.catalog.tableExists("graft_ivf_del_idx_tombstones"))
      assert(spark.table("graft_ivf_del_idx").count() ==
        spark.table("graft_ivf_del_surv").count())
      assert(probe("graft_ivf_del_idx") == rebuilt)
      val m = spark.table("graft_ivf_del_idx").schema
        .find(_.name == "list_id").get.metadata
      assert(m.contains("graft.ivf.centroids"))
      val plan = Similarity.ivfTopKAgainstIndexTable(q, 10,
        "graft_ivf_del_idx", nProbe = 3, broadcastQueries = false)
        .queryExecution.executedPlan.toString
      assert(plan.contains("Bucketed: true"),
        s"compacted index must still scan bucketed:\n$plan")
      // no-op compaction
      Similarity.compactIvfIndexTable(spark, "graft_ivf_del_idx")
      assert(probe("graft_ivf_del_idx") == rebuilt)
    } finally {
      Seq("graft_ivf_del_idx", "graft_ivf_del_idx_tombstones",
        "graft_ivf_del_idx_stage", "graft_ivf_del_surv")
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    }
  }

  test("IVF recluster-on-compact == drop-and-rebuild from the survivors, bit for bit") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = e.where(col("vec_id") % 100 === 0)
    val dead = e.where(col("vec_id") % 5 === 3).select("vec_id")
    val survivors = e.where(col("vec_id") % 5 =!= 3)
    val index = Similarity.ivfTrain(e, nLists = 8)
    def probe(t: String) = Similarity.ivfTopKAgainstIndexTable(q, 10, t,
      nProbe = 3).collect().map(_.toSeq).toSet
    try {
      Similarity.writeIvfIndexTable(e, index, "graft_ivf_rc_idx", nBuckets = 4)
      Similarity.deleteFromIvfIndexTable(dead, "graft_ivf_rc_idx")
      Similarity.compactIvfIndexTable(spark, "graft_ivf_rc_idx",
        recluster = true)
      // the reference: drop everything and rebuild the index from the
      // surviving corpus with a freshly trained quantizer (same nLists,
      // same train discipline)
      val freshIndex = Similarity.ivfTrain(survivors, nLists = 8)
      Similarity.writeIvfIndexTable(survivors, freshIndex,
        "graft_ivf_rc_fresh", nBuckets = 4)
      // centroids in the schema metadata are the retrained set exactly
      def cents(t: String) = spark.table(t).schema
        .find(_.name == "list_id").get.metadata
        .getDoubleArray("graft.ivf.centroids").toSeq
      assert(cents("graft_ivf_rc_idx") == cents("graft_ivf_rc_fresh"),
        "recluster must retrain to the same centroids a fresh build trains")
      // table contents identical: same (id, list assignment) facts
      val got = spark.table("graft_ivf_rc_idx")
        .select("vec_id", "list_id").collect()
        .map(r => (r.getLong(0), r.getInt(1))).toSet
      val want = spark.table("graft_ivf_rc_fresh")
        .select("vec_id", "list_id").collect()
        .map(r => (r.getLong(0), r.getInt(1))).toSet
      assert(got == want, "reassigned lists must match a fresh build")
      // probe at the same operating point is bit-identical
      val a = probe("graft_ivf_rc_idx")
      assert(a.nonEmpty && a == probe("graft_ivf_rc_fresh"))
      // and the layout survives: still bucketed, no tombstones left
      assert(!spark.catalog.tableExists("graft_ivf_rc_idx_tombstones"))
      val plan = Similarity.ivfTopKAgainstIndexTable(q, 10,
        "graft_ivf_rc_idx", nProbe = 3, broadcastQueries = false)
        .queryExecution.executedPlan.toString
      assert(plan.contains("Bucketed: true"),
        s"reclustered index must still scan bucketed:\n$plan")
    } finally {
      Seq("graft_ivf_rc_idx", "graft_ivf_rc_idx_tombstones",
        "graft_ivf_rc_idx_stage", "graft_ivf_rc_fresh")
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    }
  }

  test("embedDecontaminate: planted leak flags at 1.0, tie to smaller bench id, clean rows pass, no shuffle") {
    val bench = Seq(
      1L -> Array(1.0, 0.0, 0.0, 0.0),
      2L -> Array(1.0, 0.0, 0.0, 0.0), // duplicate bench vector: tie -> id 1
      3L -> Array(0.0, 1.0, 0.0, 0.0))
    val corpus = Seq(
      (10L, Seq(2.0, 0.0, 0.0, 0.0)),   // scaled copy of bench 1/2 -> sim 1.0
      (11L, Seq(0.0, 0.9, 0.1, 0.0)),   // near bench 3
      (12L, Seq(0.0, 0.0, 0.0, 1.0)))   // orthogonal to every bench -> clean
      .toDF("vec_id", "embedding")
    val got = Similarity.embedDecontaminate(corpus, bench, 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
      .sortBy(_._1)
    assert(got == Seq(
      (10L, 1L, 1.0),                     // tie between bench 1 and 2 -> 1
      (11L, 3L, 0.9939)))                 // 0.9/sqrt(0.82) rounded 4 dp
    assert(Similarity.embedDecontaminate(corpus, bench, 0.9999)
      .collect().map(_.getLong(0)).toSeq == Seq(10L))
    intercept[IllegalArgumentException] {
      Similarity.embedDecontaminate(corpus, Nil, 0.9) }
    intercept[IllegalArgumentException] {
      Similarity.embedDecontaminate(corpus, bench, 0.0) }
    intercept[IllegalArgumentException] {
      Similarity.embedDecontaminate(corpus,
        (1L to 513L).map(i => i -> Array(1.0, 0.0, 0.0, 0.0)), 0.9) }
    // the corpus never shuffles: the benchmark argmax folds inside the scan
    val plan = Similarity.embedDecontaminate(corpus, bench, 0.9)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"expected shuffle-free plan:\n$plan")
  }

  test("semanticDedup: cell assignment, smaller-id-wins drop rule, cross-cell dups survive") {
    import spark.implicits._
    // two orthogonal cell directions; duplicates planted along each
    val ex = Array(1.0, 0.0, 0.0, 0.0)
    val ey = Array(0.0, 1.0, 0.0, 0.0)
    def mix(a: Array[Double], b: Array[Double], t: Double) =
      a.zip(b).map { case (x, y) => x * (1 - t) + y * t }
    val rows = Seq(
      1L -> ex, 2L -> ex,                 // exact dups in cell(ex): 2 dropped
      3L -> mix(ex, ey, 0.05),            // near ex: cosine to 1 ~0.999 -> dropped
      4L -> ey, 5L -> mix(ey, ex, 0.05),  // ey cell: 5 near 4 -> dropped
      6L -> mix(ex, ey, 0.5)              // diagonal: near-dup of nobody smaller? cos(6,1)=0.707 >= .9? no
    )
    val df = rows.map { case (i, v) => (i, v.map(_.toFloat)) }.toDF("vec_id", "embedding")
    val anchors = Seq(100L -> ex, 200L -> ey)
    val got = Similarity.semanticDedup(df, anchors, threshold = 0.9)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // survivors: 1 (first of the ex dups), 4 (first of the ey pair), 6
    assert(got.keySet == Set(1L, 4L, 6L))
    assert(got(1L) == 100L && got(4L) == 200L)
    // the diagonal vector ties 0.7071 to both anchors -> smallest anchor id
    assert(got(6L) == 100L)
    // hashAnchors: deterministic and partitioning-invariant
    val a1 = Similarity.hashAnchors(df, 3, salt = "t")
    val a2 = Similarity.hashAnchors(df.repartition(5), 3, salt = "t")
    assert(a1.map(_._1) == a2.map(_._1) && a1.size == 3)
  }

  test("probing a non-IVF-index table is rejected at plan time") {
    try {
      vecs.withColumnRenamed("vec_id", "list_id").write.mode("overwrite")
        .saveAsTable("graft_ivf_not_idx")
      val e = intercept[IllegalArgumentException] {
        Similarity.ivfTopKAgainstIndexTable(vecs, 10, "graft_ivf_not_idx")
      }
      assert(e.getMessage.contains("writeIvfIndexTable"))
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_ivf_not_idx")
    }
  }

  test("cosine near-dup: exact pairs match a driver-side brute force; LSH pairs are a verified subset") {
    val exact = Similarity.cosineNearDupPairs(vecs, 0.95)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // driver-side oracle over the tiny fixture
    val local = vecs.collect().map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))
    def cos(a: Array[Double], b: Array[Double]) = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val expected = (for {
      (ia, va) <- local; (ib, vb) <- local
      if ia < ib && BigDecimal(cos(va, vb)).setScale(4, BigDecimal.RoundingMode.HALF_UP) >= 0.95
    } yield (ia, ib)).toSet
    assert(exact == expected)
    assert(exact.contains((0L, 1L)))    // the planted perturbed copy
    // LSH path: verified cosine makes every emitted pair a true near-dup
    val lsh = Similarity.lshNearDupPairs(vecs, 0.95, dim = 16, nTables = 6, planesPerTable = 3)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(exact))
    // a 0.9999-cosine pair survives 6 tables of 3 planes with near-certainty
    assert(lsh.contains((0L, 1L)))
  }

  test("lshNearDupPairs accepts a non-bigint id column (cast up front, no runtime CCE)") {
    val intIds = vecs.select(col("vec_id").cast("int").as("vec_id"), col("embedding"))
    val lshInt = Similarity.lshNearDupPairs(intIds, 0.95, dim = 16, nTables = 6, planesPerTable = 3)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lshLong = Similarity.lshNearDupPairs(vecs, 0.95, dim = 16, nTables = 6, planesPerTable = 3)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lshInt == lshLong && lshInt.contains((0L, 1L)))
  }

  test("multimodal decode: byte features match the payload bytes") {
    val df = Seq((1L, "ABC"), (2L, "")).toDF("id", "text")
      .select(col("id"), col("text").cast("binary").as("data"))
    val f = Multimodal.mediaFeatures(df, "id", "data").orderBy("id").collect()
    assert(f(0).getLong(1) == 3L)       // n_bytes
    assert(f(0).getInt(2) == 'A'.toInt) // first_byte
    assert(f(0).getLong(3) == 'A' + 'B' + 'C')
    assert(f(0).getString(4) == "unknown" && f(0).getInt(5) == -1 && f(0).getInt(6) == -1)
    assert(f(1).getLong(1) == 0L && f(1).getInt(2) == -1 && f(1).getLong(3) == 0L)
  }

  test("multimodal image header parse: PNG IHDR, JPEG SOF scan, GIF LSD, junk") {
    def b(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray
    // PNG: sig + IHDR length(13) + "IHDR" + width 640 + height 480 (BE)
    val png = b(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a,
      0, 0, 0, 13, 'I', 'H', 'D', 'R', 0, 0, 2, 0x80, 0, 0, 1, 0xE0)
    assert(Multimodal.imageHeader(png) == (("png", 640, 480)))
    // JPEG: SOI, then an APP0 segment to skip, then SOF0 with h=480 w=640
    val jpeg = b(0xFF, 0xD8,
      0xFF, 0xE0, 0x00, 0x04, 0x4A, 0x46,               // APP0, len 4
      0xFF, 0xC0, 0x00, 0x0B, 8, 0x01, 0xE0, 0x02, 0x80, 1, 0x11, 0, 0)
    assert(Multimodal.imageHeader(jpeg) == (("jpeg", 640, 480)))
    // progressive JPEG (SOF2) parses the same way
    val jpeg2 = b(0xFF, 0xD8, 0xFF, 0xC2, 0x00, 0x0B, 8, 0x00, 0x64, 0x00, 0xC8, 1)
    assert(Multimodal.imageHeader(jpeg2) == (("jpeg", 200, 100)))
    // JPEG signature with no SOF in the payload: format known, dims unknown
    assert(Multimodal.imageHeader(b(0xFF, 0xD8, 0xFF, 0xD9)) == (("jpeg", -1, -1)))
    // GIF89a logical screen descriptor is little-endian: 320 x 200
    val gif = b('G', 'I', 'F', '8', '9', 'a', 0x40, 0x01, 0xC8, 0x00)
    assert(Multimodal.imageHeader(gif) == (("gif", 320, 200)))
    // WEBP: RIFF container, dims from the first chunk's bitstream header
    def riffWebp(chunk: String, payload: Array[Byte]): Array[Byte] =
      "RIFF".getBytes ++ b(0, 0, 0, 0) ++ "WEBP".getBytes ++
        chunk.getBytes ++ b(0, 0, 0, 0) ++ payload
    // VP8X: flags(1) reserved(3) then 24-bit LE canvas-1: 639x479 -> 640x480
    val vp8x = riffWebp("VP8X", b(0, 0, 0, 0, 0x7F, 0x02, 0x00, 0xDF, 0x01, 0x00))
    assert(Multimodal.imageHeader(vp8x) == (("webp", 640, 480)))
    // VP8L: 0x2F then packed 14+14 bits (w-1=319, h-1=239) -> 320x240
    val lbits = 319L | (239L << 14)
    val vp8l = riffWebp("VP8L", Array(0x2F.toByte) ++
      (0 until 4).map(i => ((lbits >> (8 * i)) & 0xff).toByte))
    assert(Multimodal.imageHeader(vp8l) == (("webp", 320, 240)))
    // VP8 lossy: 3-byte frame tag, 9D 01 2A sync, then 14-bit LE dims
    val vp8 = riffWebp("VP8 ", b(0, 0, 0, 0x9D, 0x01, 0x2A, 0x40, 0x01, 0xF0, 0x00))
    assert(Multimodal.imageHeader(vp8) == (("webp", 320, 240)))
    // recognizable container but truncated/unknown chunk: format, no dims
    assert(Multimodal.imageHeader(riffWebp("VP8L", Array(0x2F.toByte))) ==
      (("webp", -1, -1)))
    assert(Multimodal.imageHeader("RIFF0000WEBPXXXX".getBytes) == (("webp", -1, -1)))
    // junk / truncated payloads never throw
    assert(Multimodal.imageHeader("notanimage".getBytes) == (("unknown", -1, -1)))
    assert(Multimodal.imageHeader(Array.empty[Byte]) == (("unknown", -1, -1)))
    assert(Multimodal.imageHeader(png.take(20)) == (("unknown", -1, -1)))
  }

  test("multimodal frame sampling: every stride-th chunk up to maxFrames, offsets exact") {
    val payload = ("x" * 2000).getBytes // 8 chunks of 256 (last partial)
    val df = Seq((7L, payload)).toDF("id", "data")
    val frames = Multimodal.frameSample(df, "id", "data",
      chunkBytes = 256, stride = 3, maxFrames = 2).orderBy("frame_idx").collect()
    assert(frames.length == 2) // chunks 0, 3 (6 would be third but maxFrames=2)
    assert(frames.map(_.getLong(2)).toSeq == Seq(0L, 768L))
    assert(frames(0).getAs[Array[Byte]](3).length == 256)
    // empty payload -> no frames, row disappears (flatMap shape)
    val none = Multimodal.frameSample(
      Seq((8L, Array.empty[Byte])).toDF("id", "data"), "id", "data")
    assert(none.count() == 0)
  }

  test("multimodal resize composes with cosine near-dup: identical payloads are exact dups") {
    val a = ("abcd" * 300).getBytes
    val b = ("abcd" * 300).getBytes            // identical content, different id
    val c = ("zzzz" * 150 + "abcd" * 150).getBytes
    val df = Seq((1L, a), (2L, b), (3L, c)).toDF("id", "data")
    val vecs = Multimodal.resizeToVector(df, "id", "data", dim = 16)
    assert(vecs.head.getSeq[Float](1).length == 16)
    val dups = Similarity.cosineNearDupPairs(vecs, 0.9999, idCol = "id")
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(dups == Set((1L, 2L)))
  }

  /** Encode a w×h image with the JDK encoder; pixel(x,y) = rgb. */
  private def encodeImage(fmt: String, w: Int, h: Int, rgb: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb(x, y))
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.setUseCache(false)
    javax.imageio.ImageIO.write(img, fmt, out)
    out.toByteArray
  }

  test("real pixel decode: PNG roundtrips exactly, JPEG decodes dims, text does not decode") {
    // PNG is lossless: decoded pixel sums are exact
    val png = encodeImage("png", 4, 3, (x, y) => ((x * 20) << 16) | ((y * 30) << 8) | 5)
    val expectSum = (for (y <- 0 until 3; x <- 0 until 4) yield x * 20 + y * 30 + 5).sum.toLong
    val jpeg = encodeImage("jpg", 6, 5, (_, _) => 0x808080)
    val df = Seq((1L, png), (2L, jpeg), (3L, "not an image".getBytes))
      .toDF("id", "data")
    val f = Multimodal.pixelFeatures(df, "id", "data").orderBy("id").collect()
    assert(f(0).getBoolean(1) && f(0).getString(2) == "png" &&
      f(0).getInt(3) == 4 && f(0).getInt(4) == 3 && f(0).getLong(5) == expectSum)
    // JPEG is lossy: dims exact, sum present but not asserted bit-for-bit
    assert(f(1).getBoolean(1) && f(1).getString(2) == "jpeg" &&
      f(1).getInt(3) == 6 && f(1).getInt(4) == 5 && !f(1).isNullAt(5))
    assert(!f(2).getBoolean(1) && f(2).getString(2) == "unknown" && f(2).isNullAt(5))
  }

  test("real resize: uniform image -> uniform thumbnail; undecodable falls back to byte buckets") {
    val gray = encodeImage("png", 32, 32, (_, _) => 0x646464) // 100,100,100
    val df = Seq((1L, gray), (2L, "plain text".getBytes)).toDF("id", "data")
    val t = Multimodal.imageThumbnail(df, "id", "data", w = 4, h = 4)
      .orderBy("id").collect()
    val v1 = t(0).getSeq[Float](1)
    assert(v1.length == 16)
    // uniform rgb(100) -> one gray level everywhere (any resampling agrees)
    assert(v1.distinct.length == 1 && math.abs(v1.head - 100 / 255.0f) < 0.02f)
    // fallback path == resizeToVector at the same dim
    val fb = Multimodal.resizeToVector(
      Seq((2L, "plain text".getBytes)).toDF("id", "data"), "id", "data", dim = 16)
      .head.getSeq[Float](1)
    assert(t(1).getSeq[Float](1) == fb)
  }

  test("audio metadata: canonical WAV header parses; junk and truncation stay sentinel") {
    def wav(channels: Int, rate: Int, bits: Int, dataBytes: Int): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(44 + dataBytes)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes).putInt(36 + dataBytes).put("WAVE".getBytes)
      bb.put("fmt ".getBytes).putInt(16).putShort(1).putShort(channels.toShort)
      bb.putInt(rate).putInt(rate * channels * bits / 8)
      bb.putShort((channels * bits / 8).toShort).putShort(bits.toShort)
      bb.put("data".getBytes).putInt(dataBytes)
      bb.array()
    }
    val df = Seq((1L, wav(1, 44100, 16, 2000)), (2L, "RIFFnope".getBytes),
      (3L, wav(2, 8000, 8, 0))).toDF("id", "data")
    val a = Multimodal.audioMeta(df, "id", "data").orderBy("id").collect()
    assert(a(0).getBoolean(1) && a(0).getInt(2) == 1 && a(0).getInt(3) == 44100 &&
      a(0).getInt(4) == 16 && a(0).getLong(5) == 1000L)
    assert(!a(1).getBoolean(1) && a(1).getInt(2) == -1)
    assert(a(2).getBoolean(1) && a(2).getInt(2) == 2 && a(2).getInt(4) == 8 &&
      a(2).getLong(5) == 0L)
    // truncated header never throws
    assert(Multimodal.wavHeader("RIFF".getBytes).isEmpty)
    // keep the fmt chunk, drop the data chunk: layout parses, length unknown
    assert(Multimodal.wavHeader(wav(2, 8000, 16, 100).take(38)).exists(_.dataBytes == -1L))
    // malformed chunk size near Int.MaxValue must not wrap the offset
    // negative (would AIOOBE-crash the task on one corrupt record): the
    // oversized chunk walks past the payload and parsing ends cleanly
    def evilWav(size: Int): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(64)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes).putInt(56).put("WAVE".getBytes)
      bb.put("fmt ".getBytes).putInt(16).putShort(1).putShort(2)
      bb.putInt(8000).putInt(8000 * 2 * 2).putShort(4).putShort(16)
      bb.put("LIST".getBytes).putInt(size) // bogus chunk with hostile size
      bb.array()
    }
    for (s <- Seq(Int.MaxValue - 5, Int.MaxValue, -1, -8, Int.MinValue)) {
      val parsed = Multimodal.wavHeader(evilWav(s))
      assert(parsed.exists(h => h.channels == 2 && h.sampleRate == 8000 &&
        h.bitsPerSample == 16 && h.dataBytes == -1L), s"size=$s")
    }
  }

  test("video metadata: ISO-BMFF box walk parses mvhd v0/v1; junk and hostile sizes stay sentinel") {
    import java.nio.ByteBuffer
    def ftyp(brand: String): Array[Byte] = {
      val bb = ByteBuffer.allocate(16)
      bb.putInt(16).put("ftyp".getBytes("US-ASCII"))
        .put(brand.getBytes("US-ASCII")).putInt(0x200)
      bb.array()
    }
    // minimal moov: mvhd v0 (ts, dur) + nTraks empty trak boxes
    def mp4(ts: Int, dur: Int, nTraks: Int): Array[Byte] = {
      val mvhd = ByteBuffer.allocate(28)
      mvhd.putInt(28).put("mvhd".getBytes("US-ASCII"))
        .putInt(0).putInt(0).putInt(0).putInt(ts).putInt(dur)
      val moovSize = 8 + 28 + 8 * nTraks
      val bb = ByteBuffer.allocate(16 + moovSize)
      bb.put(ftyp("isom"))
      bb.putInt(moovSize).put("moov".getBytes("US-ASCII")).put(mvhd.array())
      (0 until nTraks).foreach(_ =>
        bb.putInt(8).put("trak".getBytes("US-ASCII")))
      bb.array()
    }
    val h = Multimodal.mp4Header(mp4(1000, 5000, 2))
    assert(h.contains(Multimodal.Mp4Header("isom", 1000L, 5000L, 2)))
    assert(h.exists(x => math.abs(x.durationSeconds - 5.0) < 1e-12))
    // mvhd version 1 (64-bit times) under a largesize moov box
    val mvhd1 = ByteBuffer.allocate(40)
    mvhd1.putInt(40).put("mvhd".getBytes("US-ASCII"))
      .putInt(0x01000000).putLong(0L).putLong(0L).putInt(90000).putLong(123456789L)
    val moov1 = ByteBuffer.allocate(16 + 40)
    moov1.putInt(1).put("moov".getBytes("US-ASCII")).putLong(16L + 40L)
      .put(mvhd1.array())
    val v1 = Multimodal.mp4Header(ftyp("mp42") ++ moov1.array())
    assert(v1.contains(Multimodal.Mp4Header("mp42", 90000L, 123456789L, 0)))
    // junk, truncation, wrong leading box: sentinel, never a throw
    assert(Multimodal.mp4Header("not a video at all".getBytes).isEmpty)
    assert(Multimodal.mp4Header(ftyp("isom").take(10)).isEmpty)
    assert(Multimodal.mp4Header(mp4(1000, 5000, 1).take(30)).isEmpty)
    // hostile box sizes: sub-header (4) and giant unsigned (0xFFFFFFFF)
    for (sz <- Seq(4, 0xffffffff)) {
      val bb = ByteBuffer.allocate(16 + 8)
      bb.put(ftyp("isom")).putInt(sz).put("moov".getBytes("US-ASCII"))
      assert(Multimodal.mp4Header(bb.array()).isEmpty, s"size=$sz")
    }
    // the DataFrame operator: real rows + sentinel rows
    val df = Seq((1L, mp4(600, 1800, 3)), (2L, "plain".getBytes))
      .toDF("id", "data")
    val rows = Multimodal.videoMeta(df, "id", "data").orderBy("id").collect()
    assert(rows(0).getBoolean(1) && rows(0).getString(2) == "isom" &&
      rows(0).getLong(3) == 600L && rows(0).getLong(4) == 1800L &&
      rows(0).getInt(5) == 3)
    assert(!rows(1).getBoolean(1) && rows(1).getLong(3) == -1L)
  }

  test("scalarQuantize: closed-form codes, extremes hit 0/255, degenerate dim codes 0 with no error") {
    val d = Seq(
      (1L, Array(0f, 100f, 7f)),
      (2L, Array(50f, 100f, 7f)),
      (3L, Array(100f, 300f, 7f))).toDF("vec_id", "embedding")
    val got = Similarity.scalarQuantize(d).collect()
      .map(r => r.getLong(0) -> ((r.getSeq[Int](1), r.getDouble(2)))).toMap
    // dim0 [0,100], dim1 [100,300], dim2 degenerate [7,7]
    assert(got(1L)._1 == Seq(0, 0, 0) && got(1L)._2 == 0.0)
    assert(got(3L)._1 == Seq(255, 255, 0) && got(3L)._2 == 0.0)
    assert(got(2L)._1 == Seq(128, 0, 0))
    // replica of the documented double arithmetic, folded in dim order
    val recon = 0.0 + 128.0 * (100.0 - 0.0) / 255.0
    val want = BigDecimal(0.0 + (50.0 - recon) * (50.0 - recon))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(2L)._2 == want, s"got ${got(2L)._2} want $want")
  }

  test("kmeansStep: cosine assignment, fixed-point centroid means match a driver replica") {
    val d = Seq(
      (1L, Array(1f, 0.1f)), (2L, Array(0.9f, 0f)),   // -> anchor 10
      (3L, Array(0.1f, 1f)), (4L, Array(0f, 0.8f))).  // -> anchor 20
      toDF("vec_id", "embedding")
    val anchors = Seq(10L -> Array(1.0, 0.0), 20L -> Array(0.0, 1.0))
    val got = Similarity.kmeansStep(d, anchors).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getSeq[Double](2)))).toMap
    def replica(vs: Seq[Array[Float]]): Seq[Double] = {
      val n = vs.length
      (0 until 2).map { j =>
        val fx = vs.map(v => math.floor(v(j).toDouble * 1e6).toLong).sum
        BigDecimal(fx.toDouble / 1e6 / n)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      }
    }
    assert(got(10L)._1 == 2L)
    assert(got(10L)._2 == replica(Seq(Array(1f, 0.1f), Array(0.9f, 0f))))
    assert(got(20L)._1 == 2L)
    assert(got(20L)._2 == replica(Seq(Array(0.1f, 1f), Array(0f, 0.8f))))
  }

  test("kmeansStep: equidistant vector ties to the smaller anchor id; iterating converges on a planted split") {
    val tie = Seq((1L, Array(1f, 1f))).toDF("vec_id", "embedding")
    val anchors = Seq(5L -> Array(1.0, 0.0), 7L -> Array(0.0, 1.0))
    assert(Similarity.kmeansStep(tie, anchors).head.getLong(0) == 5L)
    // two tight planted clusters: one step from rough anchors lands the
    // centroids near the true means, a second step is a fixed point
    val rng = new scala.util.Random(5L)
    val pts = (0L until 30L).map { i =>
      val base = if (i % 2 == 0) Array(10f, 0f) else Array(0f, 10f)
      (i, base.map(v => v + rng.nextFloat() * 0.1f))
    }.toDF("vec_id", "embedding")
    val a0 = Seq(1L -> Array(1.0, 0.1), 2L -> Array(0.1, 1.0))
    val c1 = Similarity.kmeansStep(pts, a0).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](2).toArray).toMap
    val a1 = c1.toSeq.sortBy(_._1)
    val c2 = Similarity.kmeansStep(pts, a1).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](2)).toMap
    assert(c2(1L) == c1(1L).toSeq && c2(2L) == c1(2L).toSeq)
  }

  test("kmeansFit: equals manually chained steps with carry; converges and early-stops on planted clusters") {
    val rng = new scala.util.Random(5L)
    val pts = (0L until 30L).map { i =>
      val base = if (i % 2 == 0) Array(10f, 0f) else Array(0f, 10f)
      (i, base.map(v => v + rng.nextFloat() * 0.1f))
    }.toDF("vec_id", "embedding").localCheckpoint(true)
    // replica: seed + manual step/carry chain, same depth
    def chain(rounds: Int): Seq[(Long, Array[Double])] = {
      var a = Similarity.hashAnchors(pts, 2, salt = "fitspec")
      (1 to rounds).foreach { _ =>
        val c = Similarity.kmeansStep(pts, a).collect()
          .map(r => r.getLong(0) -> r.getSeq[Double](2).toArray).toMap
        a = a.map { case (aid, av) => aid -> c.getOrElse(aid, av) }
      }
      a
    }
    val (got, iters) = Similarity.kmeansFit(pts, 2, maxIter = 5, salt = "fitspec")
    // tight planted clusters: round 2 reproduces round 1's centroids, the
    // fixed point is detected and the loop stops early
    assert(iters < 5, s"expected early stop, ran $iters")
    val manual = chain(iters)
    assert(got.map(_._1) == manual.map(_._1))
    got.zip(manual).foreach { case ((_, a), (_, b)) =>
      assert(java.util.Arrays.equals(a, b)) }
    // fixed point: one more step returns the same 6-dp centroids
    val again = Similarity.kmeansStep(pts, got).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](2).toArray).toMap
    got.foreach { case (aid, av) =>
      assert(java.util.Arrays.equals(again(aid), av)) }
  }

  test("kmeansFit: an anchor whose cell empties keeps its previous centroid") {
    // both points sit on the x axis: anchor 9 wins every assignment and
    // anchor 11's cell is empty from round 1 — its seed vector must
    // survive every round unchanged
    val pts = Seq((9L, Array(1f, 0f)), (11L, Array(0.9f, 0.001f)))
      .toDF("vec_id", "embedding")
    val (anch, _) = Similarity.kmeansFit(pts, 2, maxIter = 3, salt = "carry")
    val m = anch.toMap
    val seeds = Similarity.hashAnchors(pts, 2, salt = "carry").toMap
    val assigned = Similarity.kmeansStep(pts, seeds.toSeq).collect()
      .map(_.getLong(0)).toSet
    val empty = seeds.keySet -- assigned
    assert(empty.nonEmpty) // the fixture plants at least one empty cell
    empty.foreach(aid => assert(java.util.Arrays.equals(m(aid), seeds(aid))))
  }

  test("scalarQuantize: reconstruction error shrinks vs a 2-bit quantizer (sanity of the scale)") {
    val rng = new scala.util.Random(11L)
    val d = (0L until 50L).map(i => (i, Array.fill(8)(rng.nextFloat() * 10f)))
      .toDF("vec_id", "embedding")
    val err = Similarity.scalarQuantize(d).agg(sum("err")).head.getDouble(0)
    // 8 dims x 50 vecs on [0,10): SQ8 mean squared error per element is
    // ~ (range/255)^2/12 ~ 1.3e-4; total well under 1.0
    assert(err >= 0.0 && err < 1.0, s"total err $err")
  }
}
