package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Vector-similarity search over an embedding column (`array<float>`).
  *
  *  - [[bruteForceTopK]]: exact cosine top-k — the correctness baseline.
  *    The (small) query set is broadcast against the full corpus, so the
  *    corpus is scanned once, partition-parallel, no shuffle of the corpus
  *    itself; only k rows per query survive the window.
  *  - [[lshTopK]]: the scale path — sign-random-projection LSH buckets both
  *    sides, turning the crossJoin into an equi-join on the bucket code.
  *    Recall < 1 by construction (single-probe); the bucket count/planes
  *    trade recall for speed.
  *
  * Dot products run in double precision via `zip_with` + `aggregate`
  * (sequential fold, deterministic order — reproducible by the oracle).
  */
object Similarity {

  /** Native codegen'd dot product (see [[graft.expressions.DotProduct]]);
    * element-order double accumulation, so values are bit-identical to the
    * interpreted `zip_with`+`aggregate` fold and to the SQL oracle. */
  def dot(a: Column, b: Column): Column =
    graft.expressions.GraftExtensions.dot_product(a, b)

  /** The interpreted-HOF formulation, kept as the parity/behavior oracle
    * for [[dot]] (SimilaritySpec pins both paths equal). */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = {
    val ad = a.cast("array<double>")
    val bd = b.cast("array<double>")
    dot(ad, bd) / (norm(ad) * norm(bd))
  }

  /** `df` + precomputed double vector and L2 norm columns. Computing each
    * row's norm ONCE (instead of inside every pairwise cosine) cuts the
    * per-pair work from 3 dot products to 1; the pairwise similarity
    * `dot(va, vb) / (na * nb)` is bit-identical to the inline
    * `dot / (sqrt(dot) * sqrt(dot))` since the factors are the same values. */
  private def withNorm(df: DataFrame, vecCol: String,
      vd: String, n: String): DataFrame = {
    val d = col(vecCol).cast("array<double>")
    df.withColumn(vd, d).withColumn(n, sqrt(dot(col(vd), col(vd))))
  }

  private def pairSim(vdA: Column, nA: Column, vdB: Column, nB: Column): Column =
    round(dot(vdA, vdB) / (nA * nB), 4)

  /** Exact top-k neighbours for each query vector.
    * Ranking key is (round(sim, 4) desc, id asc): rounding makes the rank
    * stable across engines whose last-ulp sums differ; ties break by id. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val c = withNorm(corpus, vecCol, "__vd", "__n")
    val q = withNorm(queries.select(col(idCol).as("q_id"), col(vecCol).as("q_vec")),
      "q_vec", "__qvd", "__qn")
    val sim = c.join(broadcast(q), col(idCol) =!= col("q_id"))
      .select(col("q_id"), col(idCol),
        pairSim(col("__vd"), col("__n"), col("__qvd"), col("__qn")).as("sim"))
    val w = Window.partitionBy("q_id").orderBy(col("sim").desc, col(idCol))
    sim.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }

  /** Deterministic pseudo-random hyperplanes for sign-projection LSH. */
  def randomPlanes(nPlanes: Int, dim: Int, seed: Long = 7L): Seq[Seq[Double]] = {
    val rng = new scala.util.Random(seed)
    Seq.fill(nPlanes)(Seq.fill(dim)(rng.nextGaussian()))
  }

  /** Sign-projection bucket code: bit i = (v · plane_i) > 0. */
  def lshCode(vec: Column, planes: Seq[Seq[Double]]): Column = {
    val vd = vec.cast("array<double>")
    planes.zipWithIndex.map { case (p, i) =>
      val planeCol = array(p.map(lit): _*)
      when(dot(vd, planeCol) > 0.0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** IVF (inverted-file) index state: coarse-quantizer centroids. */
  final case class IvfIndex(centroids: Array[Array[Double]]) {
    def nLists: Int = centroids.length
  }

  /** Train the IVF coarse quantizer: k-means over (a sample of) the corpus.
    * Runs on the driver over a bounded sample — the index is tiny (nLists ×
    * dim doubles) and broadcasts; assignment/search stay fully distributed.
    *
    * The sample is the `sampleSize` rows with the smallest `xxhash64(vec)` —
    * a deterministic uniform pseudo-random draw (top-k runs as per-partition
    * heaps + driver merge, never a full sort). A bare `limit(sampleSize)`
    * would take whatever partitions answer first: nondeterministic AND
    * biased toward the head of the corpus — a time-ordered corpus would
    * train its centroids on old data only. Hash-order needs no corpus-count
    * pass to pick a fraction and is append-stable by the same argument as
    * [[Sampling.hashBucket]]; the vector itself tiebreaks equal hashes so
    * the draw is fully deterministic. */
  def ivfTrain(corpus: DataFrame, nLists: Int, sampleSize: Int = 10000,
      iterations: Int = 10, seed: Long = 11L,
      vecCol: String = "embedding"): IvfIndex = {
    val sample = corpus.select(col(vecCol).cast("array<double>").as("__v"))
      // NULL embeddings would sort FIRST (asc nulls-first) and deterministically
      // displace real sample rows — then NPE in the k-means loop
      .where(col("__v").isNotNull)
      .orderBy(xxhash64(col("__v")), col("__v"))
      .limit(sampleSize).collect().map(_.getSeq[Double](0).toArray)
    require(sample.nonEmpty, "cannot train IVF on an empty corpus")
    val dim = sample.head.length
    val rng = new scala.util.Random(seed)
    var centroids = Array.fill(nLists)(sample(rng.nextInt(sample.length)).clone())
    def nearest(v: Array[Double]): Int = {
      var best = 0; var bestD = Double.MaxValue; var c = 0
      while (c < centroids.length) {
        var d = 0.0; var i = 0
        while (i < dim) { val t = v(i) - centroids(c)(i); d += t * t; i += 1 }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      best
    }
    (0 until iterations).foreach { _ =>
      val sums = Array.fill(nLists)(new Array[Double](dim))
      val counts = new Array[Long](nLists)
      sample.foreach { v =>
        val c = nearest(v); counts(c) += 1
        var i = 0; while (i < dim) { sums(c)(i) += v(i); i += 1 }
      }
      centroids = centroids.zipWithIndex.map { case (old, c) =>
        if (counts(c) == 0) old else sums(c).map(_ / counts(c))
      }
    }
    IvfIndex(centroids)
  }

  /** Centroid-assignment column: argmin squared distance over the (small,
    * literal) centroid set. Implemented as probe-list-of-1 so every centroid
    * score is computed exactly ONCE per row inside the array constructor —
    * the earlier `when(s === least(...))` cascade re-evaluated each native
    * dot ~17x per row and was measured 5x slower end-to-end. */
  def ivfListId(vec: Column, index: IvfIndex): Column =
    element_at(ivfProbeLists(vec, index, 1), 1)

  /** IVF approximate top-k: corpus rows are bucketed by nearest centroid
    * (one shuffle-free projection); each query probes its `nProbe` nearest
    * lists and reranks candidates exactly. The candidate join is an
    * equi-join on the list id — the classic IVF trade of recall for a
    * 1/nLists·nProbe fraction of the scan. */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int, index: IvfIndex,
      nProbe: Int = 2,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val cBucketed = withNorm(corpus, vecCol, "__vd", "__n")
      .withColumn("list_id", ivfListId(col(vecCol), index))
    val q = withNorm(queries.select(col(idCol).as("q_id"), col(vecCol).as("q_vec")),
        "q_vec", "__qvd", "__qn")
      .withColumn("list_id", explode(ivfProbeLists(col("q_vec"), index, nProbe)))
    val sim = cBucketed.join(broadcast(q), Seq("list_id"))
      .where(col(idCol) =!= col("q_id"))
      .select(col("q_id"), col(idCol),
        pairSim(col("__vd"), col("__n"), col("__qvd"), col("__qn")).as("sim"))
    val w = Window.partitionBy("q_id").orderBy(col("sim").desc, col(idCol))
    sim.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }

  /** IVF top-k with a DETERMINISTIC anchor quantizer: corpus cells and
    * query probe lists both come from the [[assignToAnchors]] rule —
    * highest ROUNDED (4 dp) cosine wins, ties to the smallest anchor id —
    * so the whole pipeline (anchor selection via [[hashAnchors]],
    * assignment, probe-list restriction, exact rerank) replays exactly in
    * SQL, unlike the k-means [[ivfTrain]] quantizer whose float centroid
    * sums are order-sensitive. Same spherical-assignment metric as
    * [[kmeansStep]]; at `nProbe == anchors.length` the candidate set is
    * the full corpus and the result EQUALS [[bruteForceTopK]].
    *
    * Scale shape is [[ivfTopK]]'s: anchors are driver-side literals (the
    * per-row assignment is one codegen'd fold, zero shuffle), the
    * candidate join is a broadcast equi-join on the cell id, and each
    * query scans only its `nProbe / anchors.length` corpus fraction. */
  def ivfTopKAnchored(corpus: DataFrame, queries: DataFrame, k: Int,
      anchors: Seq[(Long, Array[Double])], nProbe: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(anchors.nonEmpty, "ivfTopKAnchored requires at least one anchor")
    require(nProbe >= 1 && nProbe <= anchors.length,
      s"nProbe must be in [1, ${anchors.length}], got $nProbe")
    val cells = assignToAnchors(corpus, anchors, idCol, vecCol)
    val q0 = withNorm(
      queries.select(col(idCol).cast("long").as("q_id"), col(vecCol).as("q_vec")),
      "q_vec", "__qvd", "__qn")
    // probe list: the nProbe anchors with the smallest cosine DISTANCE
    // 1.0 - round(cos, 4), ties to the smallest anchor id. The distance
    // form keeps the sort key nonnegative (round can yield -0.0, whose
    // ordering differs across engines; 1 - s never does) and is strictly
    // decreasing in s at 4 dp granularity, so it is the same (s desc, aid)
    // order the cell rule uses — probe list head == assigned cell.
    val scored = array(anchors.map { case (aid, av) =>
      struct((lit(1.0) - round(dot(col("__qvd"), lit(av)) /
          (col("__qn") * sqrt(dot(lit(av), lit(av)))), 4)).as("d"),
        lit(aid).as("aid"))
    }: _*)
    val q = q0.withColumn("cell",
      explode(slice(transform(array_sort(scored), _.getField("aid")), 1, nProbe)))
    val sim = cells.join(broadcast(q), Seq("cell"))
      .where(col("id") =!= col("q_id"))
      .select(col("q_id"), col("id").as(idCol),
        pairSim(col("__vd"), col("__n"), col("__qvd"), col("__qn")).as("sim"))
    val w = Window.partitionBy("q_id").orderBy(col("sim").desc, col(idCol))
    sim.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }

  /** The query side's nProbe nearest list ids, as an array column. */
  def ivfProbeLists(vec: Column, index: IvfIndex, nProbe: Int): Column = {
    val vd = vec.cast("array<double>")
    val scored = index.centroids.zipWithIndex.map { case (c, i) =>
      val cCol = array(c.map(lit).toIndexedSeq: _*)
      struct((dot(vd, cCol) * (-2.0) + lit(c.map(x => x * x).sum)).as("d"), lit(i).as("i"))
    }
    slice(transform(array_sort(array(scored.toIndexedSeq: _*)), _.getField("i")), 1, nProbe)
  }

  /** Persist an IVF-assigned corpus as a list-bucketed catalog table: one
    * row per corpus vector with its precomputed double vector, L2 norm and
    * nearest-centroid `list_id`, saved `bucketBy(list_id)` + sorted so a
    * probe join reads each inverted list CO-LOCATED; the coarse quantizer
    * itself (dim + flattened centroids) rides the `list_id` column
    * metadata, so the table is self-describing — a probe physically cannot
    * run against the wrong centroids. The 100 TB shape (the third persisted
    * retrieval layout, after the BM25 and near-dup band indexes): centroid
    * assignment — the full corpus scan — is paid ONCE at write; every later
    * query batch joins its probe lists against the layout, broadcast
    * probes shuffle-free and oversized query workloads sort-merge against
    * the buckets with no Exchange over the index side. */
  def writeIvfIndexTable(corpus: DataFrame, index: IvfIndex,
      tableName: String, nBuckets: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): Unit = {
    require(nBuckets > 0, "nBuckets must be positive")
    val dim = index.centroids.head.length
    require(index.centroids.forall(_.length == dim), "ragged centroids")
    val meta = new org.apache.spark.sql.types.MetadataBuilder()
      .putLong("graft.ivf.dim", dim.toLong)
      .putDoubleArray("graft.ivf.centroids", index.centroids.flatten)
      .build()
    graft.sources.ManagedTables.clearOrphanedLocation(corpus.sparkSession, tableName)
    withNorm(corpus.select(col(idCol), col(vecCol)), vecCol, "__vd", "__n")
      .withColumn("__list", ivfListId(col(vecCol), index))
      .select(col(idCol), col("__vd").as("vec"), col("__n").as("norm"),
        col("__list").as("list_id", meta))
      .write.format("parquet")
      .bucketBy(nBuckets, "list_id").sortBy("list_id")
      .mode("overwrite").saveAsTable(tableName)
  }

  /** Fold a new vector batch into a [[writeIvfIndexTable]] index: the
    * batch assigns against the FROZEN centroids stored in the table's
    * schema metadata (index rows are per-vector facts under a fixed
    * quantizer, so append ≡ rebuild exactly — spec-pinned) and appends
    * into the existing bucket layout (numBuckets from the catalog).
    * Freezing the quantizer is the production IVF contract: lists drift as
    * the corpus distribution shifts, and the retrain cadence is a
    * corpus-level decision ([[ivfTrain]] + a fresh write), not something
    * an ingestion batch may do implicitly — a batch that silently
    * retrained would reassign NOTHING of the history and poison the
    * index. Caller owns id-uniqueness across batches. */
  def appendToIvfIndexTable(newVecs: DataFrame, tableName: String,
      idCol: String = "vec_id", vecCol: String = "embedding"): Unit = {
    val sp = newVecs.sparkSession
    require(sp.catalog.tableExists(tableName),
      s"no IVF index table at $tableName (write one with writeIvfIndexTable " +
        "before appending)")
    val idx = sp.table(tableName)
    val m = idx.schema.find(_.name == "list_id").map(_.metadata)
      .getOrElse(org.apache.spark.sql.types.Metadata.empty)
    require(m.contains("graft.ivf.dim") && m.contains("graft.ivf.centroids"),
      s"table $tableName was not written by writeIvfIndexTable (missing centroids)")
    val dim = m.getLong("graft.ivf.dim").toInt
    val index = IvfIndex(m.getDoubleArray("graft.ivf.centroids").grouped(dim).toArray)
    val spec = sp.sessionState.catalog.getTableMetadata(
      org.apache.spark.sql.catalyst.TableIdentifier(tableName)).bucketSpec
    require(spec.nonEmpty, s"$tableName is not a bucketed index table")
    withNorm(newVecs.select(col(idCol), col(vecCol)), vecCol, "__vd", "__n")
      .withColumn("__list", ivfListId(col(vecCol), index))
      .select(col(idCol), col("__vd").as("vec"), col("__n").as("norm"),
        col("__list").as("list_id"))
      .write.format("parquet")
      .bucketBy(spec.get.numBuckets, "list_id").sortBy("list_id")
      .mode("append").saveAsTable(tableName)
  }

  /** Tombstone DELETE from a [[writeIvfIndexTable]] index — the same
    * lifecycle leg as the band and BM25 indexes (takedowns / GDPR erasure
    * without rewriting the vector history): ids append into a
    * `<name>_tombstones` table that every probe anti-joins (broadcast).
    * Centroids are untouched — the standard IVF deletion contract: the
    * quantizer is a corpus-level artifact and list membership of the
    * survivors is unchanged, so probe-over-deleted ≡ probe-over-rebuilt
    * under the SAME frozen quantizer exactly (spec-pinned and test-gated
    * in SimilaritySpec). Reclaim bytes with [[compactIvfIndexTable]];
    * re-ingest a deleted id only after compaction. */
  def deleteFromIvfIndexTable(ids: DataFrame, tableName: String,
      idCol: String = "vec_id"): Unit = {
    val sp = ids.sparkSession
    require(sp.catalog.tableExists(tableName),
      s"no IVF index table at $tableName (write one with writeIvfIndexTable " +
        "before deleting)")
    if (!sp.catalog.tableExists(s"${tableName}_tombstones"))
      graft.sources.ManagedTables.clearOrphanedLocation(sp, s"${tableName}_tombstones")
    ids.select(col(idCol).cast("long").as("id")).distinct()
      .write.format("parquet").mode("append")
      .saveAsTable(s"${tableName}_tombstones")
  }

  /** Physical COMPACTION of a tombstoned [[writeIvfIndexTable]] index:
    * rewrite the surviving vector rows through a stage table, drop the
    * tombstones. By default the `list_id` column metadata (dim + frozen
    * centroids) rides the schema through the rewrite, so probes against
    * the compacted table plan exactly as before.
    *
    * `recluster = true` additionally RE-TRAINS the coarse quantizer on the
    * survivors' stored vectors and reassigns every list id — the retrain
    * cadence leg of the IVF lifecycle ([[appendToIvfIndexTable]]
    * deliberately freezes the quantizer; after enough churn the frozen
    * centroids drift off the live distribution and recall at a fixed
    * nProbe decays). The retrain is [[ivfTrain]] over the stored double
    * vectors with the SAME list count, sample size, iteration count and
    * seed discipline as a fresh build, so compact-with-recluster over the
    * survivors is BIT-IDENTICAL to dropping the index and rebuilding it
    * from the surviving corpus (ivfTrain's hash-ordered sample and the
    * stored vectors are both deterministic) — pinned in SimilaritySpec.
    * No-op when nothing is tombstoned. */
  def compactIvfIndexTable(sp: org.apache.spark.sql.SparkSession,
      tableName: String, idCol: String = "vec_id",
      recluster: Boolean = false, sampleSize: Int = 10000,
      iterations: Int = 10, seed: Long = 11L): Unit = {
    if (!sp.catalog.tableExists(s"${tableName}_tombstones")) return
    val spec = sp.sessionState.catalog.getTableMetadata(
      org.apache.spark.sql.catalyst.TableIdentifier(tableName)).bucketSpec
    require(spec.nonEmpty, s"$tableName is not a bucketed index table")
    val nBuckets = spec.get.numBuckets
    val t = sp.table(s"${tableName}_tombstones").select("id").distinct()
    val survivors0 = sp.table(tableName)
      .join(broadcast(t), col(idCol) === col("id"), "left_anti")
    val survivors = if (!recluster) survivors0 else {
      val m = survivors0.schema.find(_.name == "list_id").map(_.metadata)
        .getOrElse(org.apache.spark.sql.types.Metadata.empty)
      require(m.contains("graft.ivf.dim") && m.contains("graft.ivf.centroids"),
        s"table $tableName was not written by writeIvfIndexTable (missing centroids)")
      val dim = m.getLong("graft.ivf.dim").toInt
      val nLists = m.getDoubleArray("graft.ivf.centroids").length / dim
      val index = ivfTrain(survivors0.select(col("vec")), nLists,
        sampleSize = sampleSize, iterations = iterations, seed = seed,
        vecCol = "vec")
      val meta = new org.apache.spark.sql.types.MetadataBuilder()
        .putLong("graft.ivf.dim", dim.toLong)
        .putDoubleArray("graft.ivf.centroids", index.centroids.flatten)
        .build()
      survivors0.select(col(idCol), col("vec"), col("norm"),
        ivfListId(col("vec"), index).as("list_id", meta))
    }
    graft.sources.ManagedTables.clearOrphanedLocation(sp, s"${tableName}_stage")
    survivors.write.format("parquet")
      .bucketBy(nBuckets, "list_id").sortBy("list_id")
      .mode("overwrite").saveAsTable(s"${tableName}_stage")
    graft.sources.ManagedTables.clearOrphanedLocation(sp, tableName)
    sp.table(s"${tableName}_stage")
      .write.format("parquet")
      .bucketBy(nBuckets, "list_id").sortBy("list_id")
      .mode("overwrite").saveAsTable(tableName)
    sp.sql(s"DROP TABLE IF EXISTS ${tableName}_stage")
    sp.sql(s"DROP TABLE IF EXISTS ${tableName}_tombstones")
    ()
  }

  /** IVF approximate top-k against a [[writeIvfIndexTable]] table —
    * bit-identical to [[ivfTopK]] over the same corpus and index (stored
    * doubles round-trip exactly through parquet; the probe replays the same
    * join/score/rank plan over the precomputed columns). Rejects tables
    * that are not graft IVF indexes at plan time. `broadcastQueries = true`
    * (the default, right for interactive batches) hints the query side into
    * a broadcast hash join so the bucketed index never shuffles;
    * pass `false` for an oversized query workload — the probe then
    * sort-merge-joins against the buckets (still no index-side Exchange:
    * the table is bucketed by `list_id`) instead of force-broadcasting a
    * frame that could OOM the executors. */
  def ivfTopKAgainstIndexTable(queries: DataFrame, k: Int, tableName: String,
      nProbe: Int = 2,
      idCol: String = "vec_id", vecCol: String = "embedding",
      broadcastQueries: Boolean = true): DataFrame = {
    require(k >= 1, s"ivfTopKAgainstIndexTable requires k >= 1, got $k")
    val idx = queries.sparkSession.table(tableName)
    val m = idx.schema.find(_.name == "list_id").map(_.metadata)
      .getOrElse(org.apache.spark.sql.types.Metadata.empty)
    require(m.contains("graft.ivf.dim") && m.contains("graft.ivf.centroids"),
      s"table $tableName was not written by writeIvfIndexTable (missing centroids)")
    require(idx.columns.contains(idCol),
      s"index table $tableName has no id column `$idCol`")
    val dim = m.getLong("graft.ivf.dim").toInt
    val index = IvfIndex(m.getDoubleArray("graft.ivf.centroids").grouped(dim).toArray)
    val q = withNorm(queries.select(col(idCol).as("q_id"), col(vecCol).as("q_vec")),
        "q_vec", "__qvd", "__qn")
      .withColumn("list_id", explode(ivfProbeLists(col("q_vec"), index, nProbe)))
    val probeSide = if (broadcastQueries) broadcast(q) else q
    // tombstone mask ([[deleteFromIvfIndexTable]]): ids deleted since the
    // last compaction anti-join out — broadcast, never an index shuffle
    val sp = queries.sparkSession
    val live =
      if (sp.catalog.tableExists(s"${tableName}_tombstones"))
        idx.join(broadcast(
          sp.table(s"${tableName}_tombstones").select("id").distinct()),
          col(idCol) === col("id"), "left_anti")
      else idx
    val sim = live.join(probeSide, Seq("list_id"))
      .where(col(idCol) =!= col("q_id"))
      .select(col("q_id"), col(idCol),
        pairSim(col("vec"), col("norm"), col("__qvd"), col("__qn")).as("sim"))
    val w = Window.partitionBy("q_id").orderBy(col("sim").desc, col(idCol))
    sim.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }

  /** Exact embedding-cosine near-dup pairs: every (a, b) with `id_a < id_b`
    * and `cosine >= threshold`. All-pairs comparison — the correctness
    * baseline (the scale path is [[lshNearDupPairs]]); sim rounded to 4
    * decimals so the rank/threshold test is stable across engines. */
  def cosineNearDupPairs(df: DataFrame, threshold: Double,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val nrm = withNorm(df.select(col(idCol).as("id"), col(vecCol)), vecCol, "vd", "n")
      .select("id", "vd", "n")
    // broadcast one side; repartition the stream side so a small single-file
    // source still fans out across all cores (the O(n^2) pair loop is the
    // work, not the scan)
    val stream = nrm.repartition(df.sparkSession.sparkContext.defaultParallelism)
    stream.as("a").join(broadcast(nrm.as("b")), col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        pairSim(col("a.vd"), col("a.n"), col("b.vd"), col("b.n")).as("sim"))
      .where(col("sim") >= threshold)
  }

  /** Embedding-cosine near-dup at scale: multi-table sign-projection LSH.
    * Each vector gets `nTables` bucket codes (independent plane sets);
    * candidate pairs share a (table, code) bucket — an equi-join, never a
    * cross product — and are verified with the exact cosine, so the output
    * is a SUBSET of [[cosineNearDupPairs]] (precision 1, recall < 1 traded
    * by nTables x planesPerTable). A pair colliding in several tables is
    * kept once, in the FIRST agreeing table (same residual trick as the
    * MinHash band join — no distinct shuffle). */
  def lshNearDupPairs(df: DataFrame, threshold: Double, dim: Int,
      nTables: Int = 4, planesPerTable: Int = 4, seed: Long = 7L,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    import org.apache.spark.sql.{Encoders, Row}
    import org.apache.spark.sql.types._
    val codes = array((0 until nTables).map(t =>
      lshCode(col(vecCol), randomPlanes(planesPerTable, dim, seed + t))): _*)
    // bucket-grouped pair generation (same rewrite as Dedup.nearDupPairs):
    // codes+norms computed once, ONE shuffle, pairs verified in the bucket
    // id cast to long up front (as Dedup.signatures does): the imperative
    // pair loop reads getLong — an int/string id column would otherwise
    // ClassCastException at runtime
    val buckets = withNorm(
        df.select(col(idCol).cast("long").as("id"), col(vecCol), codes.as("codes")),
        vecCol, "vd", "n")
      .select(col("id"), col("vd"), col("n"), col("codes"),
        posexplode(col("codes")).as(Seq("tbl", "code")))
      .groupBy("tbl", "code")
      .agg(collect_list(struct(col("id"), col("vd"), col("n"), col("codes"))).as("g"))
      .where(size(col("g")) >= 2)
      .select(col("tbl"), col("g"))
    val outSchema = StructType(Seq(
      StructField("id_a", LongType, nullable = false),
      StructField("id_b", LongType, nullable = false),
      StructField("sim", DoubleType, nullable = false)))
    buckets.flatMap { row =>
      val tbl = row.getInt(0)
      val g = row.getSeq[Row](1).sortBy(_.getLong(0))
      for {
        i <- g.indices.iterator
        j <- (i + 1 until g.length).iterator
        a = g(i); b = g(j)
        // keep the pair only in its FIRST shared table (no distinct)
        if a.getSeq[Long](3).zip(b.getSeq[Long](3))
          .indexWhere { case (x, y) => x == y } == tbl
        sim = {
          val va = a.getSeq[Double](1); val vb = b.getSeq[Double](1)
          var d = 0.0; var x = 0
          while (x < va.length) { d += va(x) * vb(x); x += 1 }
          BigDecimal(d / (a.getDouble(2) * b.getDouble(2)))
            .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
        }
        if sim >= threshold
      } yield Row(a.getLong(0), b.getLong(0), sim)
    }(Encoders.row(outSchema)).toDF()
  }

  /** Approximate top-k: candidates restricted to the query's LSH bucket. */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      planes: Seq[Seq[Double]],
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val cWithCode = withNorm(corpus, vecCol, "__vd", "__n")
      .withColumn("code", lshCode(col(vecCol), planes))
    val q = withNorm(queries.select(col(idCol).as("q_id"), col(vecCol).as("q_vec")),
        "q_vec", "__qvd", "__qn")
      .withColumn("code", lshCode(col("q_vec"), planes))
    val sim = cWithCode.join(broadcast(q), Seq("code"))
      .where(col(idCol) =!= col("q_id"))
      .select(col("q_id"), col(idCol),
        pairSim(col("__vd"), col("__n"), col("__qvd"), col("__qn")).as("sim"))
    val w = Window.partitionBy("q_id").orderBy(col("sim").desc, col(idCol))
    sim.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }

  /** Deterministic anchor selection for [[semanticDedup]]: the `k` corpus
    * rows with the smallest salted key hash (ties by id) — unbiased,
    * reproducible, and cheap (TakeOrderedAndProject: per-partition heaps,
    * no global sort; `k` rows to the driver). For production-scale corpora
    * pass k-means centroids ([[ivfTrain]]) instead — any small
    * `(anchorId, vector)` list works. */
  def hashAnchors(df: DataFrame, k: Int, salt: String = "anchors",
      idCol: String = "vec_id", vecCol: String = "embedding"): Seq[(Long, Array[Double])] = {
    require(k >= 1, s"hashAnchors requires k >= 1, got $k")
    df.select(col(idCol).cast("long").as("id"),
        col(vecCol).cast("array<double>").as("v"))
      .withColumn("__hk", graft.functions.TextFunctions.tokenHashMod(
        concat(lit(s"$salt:"), col("id").cast("string"))))
      .orderBy(col("__hk"), col("id"))
      .limit(k)
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toSeq
  }

  /** SemDeDup-style semantic dedup (cluster, then drop near-identical
    * cell-mates): every vector is assigned to the anchor with the highest
    * rounded cosine (ties to the smallest anchor id), and within a cell a
    * vector is DROPPED iff some smaller-id cell-mate has cosine >=
    * `threshold`. The drop rule is relational and deterministic (any
    * smaller-id near-dup kills, whether or not that one survives) — not
    * the sequential keep-surviving variant, which has no bounded-depth
    * distributed form.
    *
    * Scale shape: anchors are a SMALL driver-side list embedded as
    * literals, so assignment is one codegen'd fold — zero shuffle, no
    * broadcast join, no UDF. The pair scan is an equi-join on the cell id
    * with within-cell all-pairs (the SemDeDup contract): size the anchor
    * count so cells stay bounded (corpus/k vectors per cell; at 100 TB use
    * [[ivfTrain]] centroids in the tens of thousands, not [[hashAnchors]]
    * handfuls). Output: survivors as (idCol, cell). */
  /** Nearest-anchor cell assignment shared by [[semanticDedup]] and
    * [[kmeansStep]]: highest ROUNDED (4 dp) cosine wins, ties to the
    * smallest anchor id. The argmax runs over an array of (sim, -aid)
    * structs — array_max's lexicographic struct order gives max sim then
    * min id. One struct per anchor; a when-chain fold would copy the
    * accumulator tree 3x per level and blow codegen up exponentially.
    * Anchors are driver-side literals, so this is ONE codegen'd
    * expression — zero shuffle, no broadcast join, no UDF. Returns
    * (id, cell, __vd, __n). */
  private def assignToAnchors(df: DataFrame, anchors: Seq[(Long, Array[Double])],
      idCol: String, vecCol: String): DataFrame = {
    val c = withNorm(df.select(col(idCol).cast("long").as("id"), col(vecCol)),
      vecCol, "__vd", "__n")
    val cands = array(anchors.map { case (aid, av) =>
      struct(round(dot(col("__vd"), lit(av)) /
          (col("__n") * sqrt(dot(lit(av), lit(av)))), 4).as("s"),
        lit(-aid).as("na"))
    }: _*)
    c.withColumn("cell", -array_max(cands).getField("na"))
      .select(col("id"), col("cell"), col("__vd"), col("__n"))
  }

  /** Embedding-space DECONTAMINATION against a benchmark set — the vector
    * sibling of the n-gram `Dedup.decontaminateSpans` family, catching
    * paraphrased/translated eval leakage that exact grams miss: flag
    * every corpus vector whose best benchmark cosine (rounded 4 dp, ties
    * to the smallest benchmark id — the [[assignToAnchors]] determinism
    * rule) reaches `threshold`. Returns (id, bench_id, sim) for the
    * flagged vectors; scrub by broadcast-anti-joining the corpus on `id`.
    *
    * Scale shape: benchmark sets are eval-sized (KB-scale) by nature, so
    * they embed as driver-side literals — the max is ONE codegen'd fold
    * inside the corpus scan, zero shuffle, zero broadcast join, exactly
    * [[semanticDedup]]'s anchor-argmax regime (bounded at 512 like
    * [[kmeansFit]]; chunk the benchmark and OR the flags for more). */
  def embedDecontaminate(corpus: DataFrame, bench: Seq[(Long, Array[Double])],
      threshold: Double, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    require(bench.nonEmpty, "embedDecontaminate requires a non-empty benchmark")
    require(bench.size <= 512,
      s"literal-embed benchmark regime is <= 512 vectors, got ${bench.size}")
    require(!threshold.isNaN && threshold > 0.0 && threshold <= 1.0,
      s"threshold must be in (0, 1]: $threshold")
    val c = withNorm(corpus.select(col(idCol).cast("long").as("id"), col(vecCol)),
      vecCol, "__vd", "__n")
    val cands = array(bench.map { case (bid, bv) =>
      struct(round(dot(col("__vd"), lit(bv)) /
          (col("__n") * sqrt(dot(lit(bv), lit(bv)))), 4).as("s"),
        lit(-bid).as("nb"))
    }: _*)
    c.withColumn("__best", array_max(cands))
      .where(col("__best").getField("s") >= threshold)
      .select(col("id"), (-col("__best").getField("nb")).as("bench_id"),
        col("__best").getField("s").as("sim"))
  }

  /** One Lloyd iteration of SPHERICAL k-means over the embedding corpus:
    * assign every vector to its nearest anchor by rounded cosine (the
    * [[assignToAnchors]] fold — the assignment metric of spherical
    * k-means, the standard variant for normalized text embeddings), then
    * recompute per-cell centroids. Returns (cell, n, centroid).
    *
    * Chain it: `kmeansStep` output → centroid arrays → next round's
    * anchors (seed round from [[hashAnchors]] or [[ivfTrain]]). Each
    * iteration is one job; the converged centroids feed [[ivfListId]] /
    * [[writeIvfIndexTable]] as the IVF coarse quantizer.
    *
    * Scale + determinism shape: the assignment is a zero-shuffle codegen'd
    * fold (anchor literals); the centroid mean is computed in FIXED-POINT —
    * per element `floor(x * 1e6)` longs, summed per (cell, dim) in a
    * map-side-combining aggregate (dim× row inflation collapses to
    * cells × dim rows per partition), then divided back exactly once. A
    * double-sum mean would be partition-order-dependent and thus
    * nondeterministic across runs/cluster sizes; the long sum is exact in
    * ANY order (|x| ≤ 1e3 ⇒ |fx| ≤ 1e9; 2^63/1e9 ≈ 9e9 rows per cell-dim
    * before overflow). Centroids are reported at 6 dp. */
  def kmeansStep(df: DataFrame, anchors: Seq[(Long, Array[Double])],
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(anchors.nonEmpty, "kmeansStep requires at least one anchor")
    val cells = assignToAnchors(df, anchors, idCol, vecCol)
    cells.select(col("cell"), posexplode(col("__vd")).as(Seq("__d", "__x")))
      .groupBy("cell", "__d")
      .agg(sum(floor(col("__x") * 1e6)).as("__fx"), count(lit(1)).as("__cnt"))
      .groupBy("cell")
      .agg(min("__cnt").as("n"),
        transform(
          sort_array(collect_list(struct(col("__d"),
            round(col("__fx").cast("double") / 1e6 / col("__cnt"), 6).as("__c")))),
          x => x.getField("__c")).as("centroid"))
  }

  /** Full Lloyd loop of spherical k-means: [[hashAnchors]] seeds, then up
    * to `maxIter` [[kmeansStep]] rounds, stopping early once the 6-dp
    * centroids come back exactly unchanged (the step is fully
    * deterministic, so "unchanged" is bit equality, not a tolerance — and
    * an unchanged round is a FIXED POINT: chaining further rounds provably
    * returns the same centroids, which is what lets a fixed-round SQL
    * replay oracle-check an early-converging run). A cell that loses all
    * members keeps its previous centroid (the standard Lloyd carry rule),
    * so the anchor id set is stable across rounds. Returns the final
    * anchors and the number of rounds run.
    *
    * Scale shape — the iterative-loop discipline of
    * [[graft.functions.GraphOps.pagerank]], adapted to k-means'
    * centroid dependence structure: per round the corpus NEVER shuffles
    * rows (assignment is a zero-shuffle codegen'd fold over anchor
    * literals; the recompute ships only cells × dim fixed-point partials
    * through a map-side-combining aggregate), and the only driver traffic
    * is k × dim rounded doubles re-embedded as next round's literals.
    * Because each round's plan reads `df` directly through those
    * literals, lineage depth stays CONSTANT across rounds — no
    * checkpoint-every-k needed, unlike recurrences whose state is itself
    * a DataFrame (PageRank's rank vector). `df` IS re-scanned once per
    * round: cache/checkpoint an expensive upstream frame before calling.
    * The literal-embed assignment is the k ≲ few-hundred regime (the
    * codegen'd argmax grows with k); at IVF scale train on a hash sample
    * ([[ivfTrain]]) and assign the full corpus once at the end. */
  def kmeansFit(df: DataFrame, k: Int, maxIter: Int, salt: String = "kmeans",
      idCol: String = "vec_id", vecCol: String = "embedding")
      : (Seq[(Long, Array[Double])], Int) = {
    require(k >= 1 && k <= 512,
      s"kmeansFit's literal-embed assignment is the k <= 512 regime, got $k")
    require(maxIter >= 1, s"maxIter must be >= 1: $maxIter")
    var anchors = hashAnchors(df, k, salt, idCol, vecCol)
    var iter = 0
    var converged = false
    while (iter < maxIter && !converged) {
      val cents = kmeansStep(df, anchors, idCol, vecCol)
        .select(col("cell"), col("centroid")).collect()
        .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
      val next = anchors.map { case (aid, av) => aid -> cents.getOrElse(aid, av) }
      converged = next.iterator.zip(anchors.iterator).forall {
        case ((_, a), (_, b)) => java.util.Arrays.equals(a, b)
      }
      anchors = next
      iter += 1
    }
    (anchors, iter)
  }

  def semanticDedup(df: DataFrame, anchors: Seq[(Long, Array[Double])],
      threshold: Double,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(anchors.nonEmpty, "semanticDedup requires at least one anchor")
    val dim = anchors.head._2.length
    require(anchors.forall(_._2.length == dim), "ragged anchor vectors")
    val cells = assignToAnchors(df, anchors, idCol, vecCol)
    // The within-cell pair join's parallelism is bounded by the number of
    // CELLS — with few anchors every core but |cells| idles while the
    // candidate dots grind (measured 8 anchors / 32 cores: ≤8 tasks own
    // 128 M dot evaluations). Salt it: x keeps one deterministic salt
    // (id mod S), y replicates to all S salts, so each (x<y) pair still
    // meets exactly once but the key space is cells×S. S sizes itself
    // from cells-vs-cores and is 1 — no replication, plan unchanged —
    // once anchors ≥ 2×cores, the production IVF regime.
    val S = math.max(1L, math.ceil(
      2.0 * df.sparkSession.sparkContext.defaultParallelism
        / anchors.length).toLong)
    val x = cells.withColumn("__s", pmod(col("id"), lit(S)))
    val y = if (S == 1L) cells.withColumn("__s", lit(0L))
      else cells.withColumn("__s", explode(sequence(lit(0L), lit(S - 1L))))
    val dropped = x.as("x").join(y.as("y"),
        col("x.cell") === col("y.cell") && col("x.__s") === col("y.__s") &&
          col("x.id") < col("y.id") &&
          pairSim(col("x.__vd"), col("x.__n"), col("y.__vd"), col("y.__n"))
            >= threshold)
      .select(col("y.id").as("id")).distinct()
    cells.join(dropped, Seq("id"), "left_anti")
      .select(col("id").as(idCol), col("cell"))
  }

  /** Scalar (SQ8) vector quantization: per-dimension global [min, max] maps
    * each float to an int code in [0, 255] — the 4× embedding-storage /
    * memory-bandwidth compression every 100 TB vector pipeline applies
    * before ANN serving (FAISS's SQ8). Returns (idCol, codes, err) where
    * `err` is the per-vector squared reconstruction error (6 dp).
    *
    * Distributed shape: pass 1 is a posexplode + per-dim min/max — dim× row
    * inflation into a map-side-combining aggregate that ships `dim` rows
    * per partition, then `dim` rows total; the assembled (lo, hi) arrays
    * broadcast back (one row), so the corpus shuffles NOTHING. Pass 2 is a
    * pure codegen'd per-row transform.
    *
    * Exactness: code arithmetic `floor((x - lo) * 255 / (hi - lo) + 0.5)`
    * runs in double on float-widened inputs — bit-identical in any engine
    * computing the same IEEE expression (the oracle replays it verbatim);
    * min/max are exact in float. The reconstruction-error fold runs in
    * ascending dimension order from a 0.0 seed (same replay rule as
    * [[graft.functions.TextFunctions.unigramSurprisal]]). Degenerate
    * dimensions (hi == lo) code to 0 and reconstruct exactly. */
  def scalarQuantize(df: DataFrame, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val dims = df.select(posexplode(col(vecCol)).as(Seq("__d", "__v")))
      .groupBy("__d").agg(min("__v").as("__lo"), max("__v").as("__hi"))
    val stats = dims.agg(
      transform(sort_array(collect_list(struct(col("__d"), col("__lo")))),
        x => x.getField("__lo")).as("__los"),
      transform(sort_array(collect_list(struct(col("__d"), col("__hi")))),
        x => x.getField("__hi")).as("__his"))
    def loAt(i: Column) = element_at(col("__los"), i + 1).cast("double")
    def hiAt(i: Column) = element_at(col("__his"), i + 1).cast("double")
    def xAt(i: Column)  = element_at(col(vecCol), i + 1).cast("double")
    def codeAt(i: Column): Column =
      when(hiAt(i) === loAt(i), lit(0L))
        .otherwise(floor((xAt(i) - loAt(i)) * 255.0 / (hiAt(i) - loAt(i)) + 0.5))
    def reconAt(i: Column): Column =
      when(hiAt(i) === loAt(i), loAt(i))
        .otherwise(loAt(i) + codeAt(i).cast("double") * (hiAt(i) - loAt(i)) / 255.0)
    val idxs = sequence(lit(0), size(col(vecCol)) - 1)
    df.select(col(idCol), col(vecCol))
      .crossJoin(broadcast(stats))
      .select(col(idCol),
        transform(idxs, i => codeAt(i).cast("int")).as("codes"),
        round(aggregate(
          transform(idxs, i => (xAt(i) - reconAt(i)) * (xAt(i) - reconAt(i))),
          lit(0.0), (acc, v) => acc + v), 6).as("err"))
  }

  /** Product quantization (Jégou et al., PAMI 2011 — FAISS's PQ): the
    * vector splits into `m` contiguous subspaces; each sub-vector codes to
    * the index of its nearest codebook entry (min L2², ties to the lowest
    * index), compressing dim×4 bytes to m bytes. `anchors` supplies the
    * codebooks (each anchor's slice s is codebook entry j of subspace s —
    * seed with [[hashAnchors]] for determinism or trained centroids in
    * production). Returns (idCol, codes, err) with `err` the summed
    * per-subspace quantization error.
    *
    * Scale + determinism shape: codebooks are driver-side literals, so the
    * whole assignment is ONE codegen'd projection fused into the scan —
    * zero shuffle, no join, no UDF (same contract as [[assignToAnchors]]).
    * Each sub-distance folds its dims in ascending order from a 0.0 seed
    * (bit-identical in any engine), rounds 4 dp; the error sums the
    * rounded sub-distances in subspace order, rounds 6 dp. The argmin runs
    * over an array of (dist, j) structs via array_min's lexicographic
    * order. */
  def productQuantize(df: DataFrame, anchors: Seq[(Long, Array[Double])],
      m: Int, idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(anchors.nonEmpty, "productQuantize requires at least one anchor")
    val dim = anchors.head._2.length
    require(anchors.forall(_._2.length == dim), "ragged anchor vectors")
    require(m >= 1 && dim % m == 0,
      s"m=$m must divide the dimension $dim evenly")
    val subDim = dim / m
    val v = df.select(col(idCol), col(vecCol).cast("array<double>").as("__e"))
    def xAt(i: Int) = element_at(col("__e"), i + 1)
    def subDist(s: Int, a: Array[Double]): Column =
      (0 until subDim).foldLeft(lit(0.0)) { (acc, d) =>
        val i = s * subDim + d
        acc + (xAt(i) - lit(a(i))) * (xAt(i) - lit(a(i)))
      }
    def best(s: Int): Column = array_min(array(
      anchors.zipWithIndex.map { case ((_, a), j) =>
        struct(round(subDist(s, a), 4).as("d"), lit(j).as("j"))
      }: _*))
    val err = (0 until m).foldLeft(lit(0.0))((acc, s) =>
      acc + best(s).getField("d"))
    v.select(col(idCol),
      array((0 until m).map(s => best(s).getField("j")): _*).as("codes"),
      round(err, 6).as("err"))
  }
}
