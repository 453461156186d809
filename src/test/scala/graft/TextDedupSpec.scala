package graft

import org.apache.spark.sql.functions._
import graft.functions.{Dedup, TextFunctions => TF}

class TextDedupSpec extends SparkSuite {
  import spark.implicits._

  lazy val docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog"),
    (1L, "the quick brown fox jumps over the lazy cat"), // near-dup of 0
    (2L, "completely different content about spark engines"),
    (3L, "the quick brown fox jumps over the lazy dog"),  // exact dup of 0
    (4L, "tiny")                                          // shorter than shingle width
  ).toDF("doc_id", "text")

  test("token counts") {
    val r = docs.select(TF.tokenCount(col("text")).as("n")).collect().map(_.getInt(0))
    assert(r.toSeq == Seq(9, 9, 6, 9, 1))
    val bpe = docs.where(col("doc_id") === 0)
      .select(TF.bpeTokenCount(lit("Hello, world!"))).head.getInt(0)
    assert(bpe == 4) // Hello | , | world | !
  }

  test("charNGrams guards short strings (no descending-sequence bug)") {
    val r = docs.select(TF.charNGrams(col("text"), 5).as("g")).where(col("doc_id") === 4)
      .select(size(col("g"))).head.getInt(0)
    assert(r == 0)
  }

  test("jaccard: identity 1, near-dup high, disjoint low") {
    val j = docs.as("a").join(docs.as("b"), col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("x"), col("b.doc_id").as("y"),
        TF.ngramJaccard(col("a.text"), col("b.text"), 3).as("j"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(j((0L, 3L)) == 1.0)
    assert(j((0L, 1L)) > 0.7)
    assert(j((0L, 2L)) < 0.2)
  }

  test("ngramContainment: asymmetric — embedded doc scores 1.0 in the container, null on shingle-less") {
    import spark.implicits._
    val d = Seq((1L, "abcd"), (2L, "abcdef"), (3L, "xy")).toDF("id", "text")
    val pairs = d.as("a").crossJoin(d.as("b"))
      .select(col("a.id").as("x"), col("b.id").as("y"),
        TF.ngramContainment(col("a.text"), col("b.text"), 3).as("c"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    assert(pairs((1L, 2L)) == Some(1.0))      // abcd fully inside abcdef
    assert(pairs((2L, 1L)) == Some(0.5))      // 2 of abcdef's 4 shingles in abcd
    assert(pairs((1L, 1L)) == Some(1.0))
    assert(pairs((3L, 2L)).isEmpty)           // no shingles -> NULL, not NaN
    assert(pairs((1L, 3L)) == Some(0.0))
  }

  test("fingerprint: equal texts equal, different texts differ, bounded by modulus") {
    val fps = docs.select(col("doc_id"), TF.fingerprint(col("text")).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fps(0L) == fps(3L))
    assert(fps(0L) != fps(2L))
    assert(fps.values.forall(v => v >= 0 && v < TF.HashMod))
  }

  test("langId picks stopword-bearing language") {
    val r = Seq(
      "the cat sat on a mat and the dog",
      "der Hund und die Katze sind nicht da",
      "le chat et la souris est une histoire",
      "xyzzy qwerty").toDF("text")
      .select(TF.langId(col("text"))).collect().map(_.getString(0))
    assert(r.toSeq == Seq("en", "de", "fr", "und"))
  }

  test("minhash: identical docs identical sigs; near-dups agree on most; k respected") {
    val sigs = docs.select(col("doc_id"), Dedup.minhashSignature(col("text"), 16).as("s"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(sigs(0L).length == 16)
    assert(sigs(0L) == sigs(3L))
    val agree01 = sigs(0L).zip(sigs(1L)).count { case (a, b) => a == b }
    val agree02 = sigs(0L).zip(sigs(2L)).count { case (a, b) => a == b }
    assert(agree01 > agree02)
    assert(agree01 >= 8) // J ~ 0.8 -> expect most minhashes to collide
  }

  test("simhash: identical equal; near-dup within small hamming distance") {
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val sh = docs.select(col("doc_id"), Dedup.simhash32(col("text")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sh(0L) == sh(3L))
    assert(ham(sh(0L), sh(1L)) < ham(sh(0L), sh(2L)))
  }

  test("simhashNearDupPairs: banded pair set == all-pairs brute force (pigeonhole exactness)") {
    // random 32-bit fingerprints plus planted pairs at hamming 0, 1, 2
    // (kept) and 3 (excluded) — the banded equi-join must reproduce the
    // all-pairs graph bit-for-bit
    val rnd = new scala.util.Random(7)
    val base = (0L until 60L).map(i => (i, rnd.nextLong() & 0xffffffffL))
    val planted = Seq(
      (100L, base(0)._2),                       // hamming 0 vs id 0
      (101L, base(1)._2 ^ 0x10L),               // hamming 1 vs id 1
      (102L, base(2)._2 ^ 0x80000001L),         // hamming 2 vs id 2 (spans blocks)
      (103L, base(3)._2 ^ 0x01010100L))         // hamming 3 vs id 3 — excluded
    val rows = base ++ planted
    val sh = rows.toDF("id", "sh")
    val got = Dedup.simhashNearDupPairs(sh, maxDist = 2, bands = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = (for {
      i <- rows.indices; j <- i + 1 until rows.length
      if java.lang.Long.bitCount(rows(i)._2 ^ rows(j)._2) <= 2
    } yield {
      val (a, b) = (rows(i)._1, rows(j)._1)
      (math.min(a, b), math.max(a, b))
    }).toSet
    assert(got == brute)
    assert(got.contains((0L, 100L)) && got.contains((1L, 101L)) &&
      got.contains((2L, 102L)) && !got.contains((3L, 103L)))
    // pigeonhole precondition enforced: bands must exceed maxDist
    val e = intercept[IllegalArgumentException] {
      Dedup.simhashNearDupPairs(sh, maxDist = 4, bands = 4)
    }
    assert(e.getMessage.contains("pigeonhole"))
    // plan shape: candidate generation is an equi-join, not a nested loop
    val plan = Dedup.simhashNearDupPairs(sh).queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop") && !plan.contains("CartesianProduct"))
    // the 60-bit scale variant: same pigeonhole exactness at 15-bit blocks
    val rnd60 = new scala.util.Random(13)
    val rows60 = (0L until 50L).map(i => (i, rnd60.nextLong() & ((1L << 60) - 1))) ++
      Seq((200L, 0L), (201L, 1L << 59))               // planted hamming-1 pair
    val got60 = Dedup.simhashNearDupPairs(rows60.toDF("id", "sh"),
      maxDist = 2, bands = 4, bits = 60)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute60 = (for {
      i <- rows60.indices; j <- i + 1 until rows60.length
      if java.lang.Long.bitCount(rows60(i)._2 ^ rows60(j)._2) <= 2
    } yield (math.min(rows60(i)._1, rows60(j)._1),
      math.max(rows60(i)._1, rows60(j)._1))).toSet
    assert(got60 == brute60 && got60.contains((200L, 201L)))
  }

  test("property: banded simhash pairs == brute force across (maxDist, bands, bits) configs") {
    // the pigeonhole argument must hold at every legal configuration, not
    // just the default — clustered fingerprints maximize near-threshold
    // pairs (flip up to 4 random bits of a few base patterns)
    val rnd = new scala.util.Random(17)
    for ((maxDist, bands, bits) <- Seq((1, 2, 32), (2, 8, 32), (2, 4, 60),
        (3, 4, 60), (1, 4, 16))) {
      val mask = if (bits == 64) -1L else (1L << bits) - 1L
      val bases = Array.fill(4)(rnd.nextLong() & mask)
      val rows = (0L until 120L).map { i =>
        var v = bases(rnd.nextInt(bases.length))
        (0 until rnd.nextInt(5)).foreach(_ => v ^= 1L << rnd.nextInt(bits))
        (i, v)
      }
      val got = Dedup.simhashNearDupPairs(rows.toDF("id", "sh"),
        maxDist = maxDist, bands = bands, bits = bits)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val brute = (for {
        i <- rows.indices; j <- i + 1 until rows.length
        if java.lang.Long.bitCount(rows(i)._2 ^ rows(j)._2) <= maxDist
      } yield (rows(i)._1, rows(j)._1)).toSet
      assert(got == brute,
        s"config (maxDist=$maxDist, bands=$bands, bits=$bits): " +
          s"missing=${(brute -- got).take(3)} extra=${(got -- brute).take(3)}")
      assert(brute.nonEmpty, s"fixture must produce pairs at maxDist=$maxDist")
    }
  }

  test("simhashFast: 60-bit fingerprint extends the 32-bit one (shared low bits)") {
    // the vote loop is identical for bits 0..31, so the wide fingerprint's
    // low 32 bits must equal the oracle-pinned 32-bit simhash exactly
    val sh32 = Dedup.simhashFast(docs, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val sh60 = Dedup.simhashFast(docs, "text", "doc_id", bits = 60)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sh32.keySet == sh60.keySet)
    sh32.foreach { case (id, s) => assert((sh60(id) & 0xffffffffL) == s, s"doc $id") }
    // and the wide bits are actually populated (not zero-padded)
    assert(sh60.values.exists(_ >>> 32 != 0L))
    intercept[IllegalArgumentException] {
      Dedup.simhashFast(docs, "text", "doc_id", bits = 61)
    }
  }

  test("exact dup groups") {
    val g = Dedup.exactDupGroups(docs, "text", "doc_id")
    assert(g.count() == 4) // 5 docs, one exact pair
    val dupRow = g.where(col("cnt") === 2).head
    assert(dupRow.getLong(2) == 0L) // keeper = min doc_id
  }

  test("near-dup pipeline finds the exact and near pair, not the disjoint one") {
    val pairs = Dedup.nearDupPairs(docs, "text", "doc_id", threshold = 0.5)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 3L)))
    assert(!pairs.exists { case (a, b) => a == 2L || b == 2L })
  }

  test("nearDupPairs maxBucket: generous cap == exact; tight cap stays a value-correct subset") {
    // the 60-doc corpus below has genuine near-dup clusters (7 shared
    // bases), so band buckets of several docs exist
    val corpus = (0L until 60L).map { i =>
      val base = s"the quick brown fox jumps over the lazy dog number ${i % 7} again and again"
      (i, if (i % 3 == 0) base else base + s" tail$i extra words ${i * 31}")
    }.toDF("doc_id", "text")
    def toMap(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val exact = toMap(Dedup.nearDupPairs(corpus, "text", "doc_id", threshold = 0.4))
    // a cap no bucket exceeds must reproduce the exact pair set + values
    val generous = toMap(Dedup.nearDupPairs(corpus, "text", "doc_id",
      threshold = 0.4, maxBucket = Some(1000)))
    assert(generous == exact)
    // a tight cap may drop pairs (recall trade) but never invents or
    // re-values one, and emits each surviving pair exactly once
    val tightDf = Dedup.nearDupPairs(corpus, "text", "doc_id",
      threshold = 0.4, maxBucket = Some(3))
    val tightRows = tightDf.collect()
    assert(tightRows.length == tightRows.map(r => (r.getLong(0), r.getLong(1))).distinct.length)
    val tight = tightRows.map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(tight.keySet.subsetOf(exact.keySet))
    tight.foreach { case (k, v) => assert(exact(k) == v) }
    intercept[IllegalArgumentException] {
      Dedup.nearDupPairs(corpus, "text", "doc_id", maxBucket = Some(1)) }
  }

  test("band index probe == cross-split restriction of the batch pipeline, jaccard included") {
    // larger deterministic fixture: a shared base with id-dependent edits
    // so both cross- and same-split near-dups exist
    val corpus = (0L until 60L).map { i =>
      val base = s"the quick brown fox jumps over the lazy dog number ${i % 7} again and again"
      (i, if (i % 3 == 0) base else base + s" tail$i extra words ${i * 31}")
    }.toDF("doc_id", "text")
    val hist = corpus.where(col("doc_id") % 2 === 0)
    val fresh = corpus.where(col("doc_id") % 2 === 1)
    val path = new java.io.File(System.getProperty("java.io.tmpdir"),
      s"graft_band_index_spec_${System.nanoTime()}").getPath
    try {
      Dedup.writeBandIndex(hist, "text", "doc_id", path)
      val viaIndex = Dedup.nearDupAgainstIndex(fresh, "text", "doc_id", path, threshold = 0.4)
        .collect().map(r => ((r.getLong(1), r.getLong(0)), r.getDouble(2))).toMap
      // batch pipeline over the union, restricted to (even, odd) pairs
      val batch = Dedup.nearDupPairs(corpus, "text", "doc_id", threshold = 0.4)
        .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2)))
        .filter { case ((a, b), _) => (a % 2 == 0) != (b % 2 == 0) }
        .map { case ((a, b), j) => (if (a % 2 == 0) (a, b) else (b, a)) -> j }.toMap
      assert(viaIndex.nonEmpty, "fixture must produce cross-split near-dups")
      assert(viaIndex == batch)
      // sidecar records the write-time parameters...
      assert(Dedup.readIndexMeta(spark, path).contains((16, 4, 5, 42L)))
      // ...and a probe under different parameters is rejected at plan time
      // (a silent band mismatch would just join to nothing)
      val e = intercept[IllegalArgumentException] {
        Dedup.nearDupAgainstIndex(fresh, "text", "doc_id", path, seed = 7L)
      }
      assert(e.getMessage.contains("seed=7"))
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(new java.io.File(path))
    }
  }

  test("incremental band-index append == rebuild (path and table); mismatched/blind appends rejected") {
    val corpus = (0L until 60L).map { i =>
      val base = s"the quick brown fox jumps over the lazy dog number ${i % 7} again and again"
      (i, if (i % 3 == 0) base else base + s" tail$i extra words ${i * 31}")
    }.toDF("doc_id", "text")
    val histA = corpus.where(col("doc_id") % 4 === 0)
    val histB = corpus.where(col("doc_id") % 4 === 2)
    val hist = corpus.where(col("doc_id") % 2 === 0)
    val fresh = corpus.where(col("doc_id") % 2 === 1)
    val tmp = System.getProperty("java.io.tmpdir")
    val pInc = new java.io.File(tmp, s"graft_bidx_inc_${System.nanoTime()}").getPath
    val pFull = new java.io.File(tmp, s"graft_bidx_full_${System.nanoTime()}").getPath
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles).foreach(_.foreach(rm)); f.delete(); ()
    }
    try {
      // blind append (no index at path) is rejected: nothing to merge into
      val e0 = intercept[IllegalArgumentException] {
        Dedup.appendToBandIndex(histB, "text", "doc_id", pInc)
      }
      assert(e0.getMessage.contains("no band index"))
      Dedup.writeBandIndex(histA, "text", "doc_id", pInc)
      Dedup.appendToBandIndex(histB, "text", "doc_id", pInc)
      Dedup.writeBandIndex(hist, "text", "doc_id", pFull)
      def probe(p: String) =
        Dedup.nearDupAgainstIndex(fresh, "text", "doc_id", p, threshold = 0.4)
          .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
      val inc = probe(pInc)
      assert(inc.nonEmpty && inc == probe(pFull),
        "append over two batches must equal the one-shot rebuild")
      // a mismatched append would poison the index — rejected at plan time
      val e1 = intercept[IllegalArgumentException] {
        Dedup.appendToBandIndex(histB, "text", "doc_id", pInc, seed = 7L)
      }
      assert(e1.getMessage.contains("seed=7"))
      // the table variant: same two-step build equals the path rebuild,
      // and the merged table still scans bucketed
      Dedup.writeBandIndexTable(histA, "text", "doc_id",
        "graft_band_idx_incr", nBuckets = 4)
      Dedup.appendToBandIndexTable(histB, "text", "doc_id",
        "graft_band_idx_incr")
      val viaTable = Dedup.nearDupAgainstIndexTable(fresh, "text", "doc_id",
        "graft_band_idx_incr", threshold = 0.4)
        .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
      assert(viaTable == inc)
      val prevThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      try {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        // the huge-batch plan (broadcastProbe = false) is where bucketing
        // matters; the default broadcast plan never shuffles the index, so
        // the planner rightly skips bucketed reading there
        val plan = Dedup.nearDupAgainstIndexTable(fresh, "text", "doc_id",
          "graft_band_idx_incr", threshold = 0.4, broadcastProbe = false)
          .queryExecution.executedPlan.toString
        assert(plan.contains("Bucketed: true"),
          s"appended index must still scan bucketed:\n$plan")
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThresh)
      val e2 = intercept[IllegalArgumentException] {
        Dedup.appendToBandIndexTable(histB, "text", "doc_id",
          "graft_band_idx_incr", seed = 7L)
      }
      assert(e2.getMessage.contains("seed=7"))
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_band_idx_incr")
      rm(new java.io.File(pInc)); rm(new java.io.File(pFull))
    }
  }

  test("bucketed band-index TABLE: probe == path probe, index side joins with no shuffle") {
    val corpus = (0L until 60L).map { i =>
      val base = s"the quick brown fox jumps over the lazy dog number ${i % 7} again and again"
      (i, if (i % 3 == 0) base else base + s" tail$i extra words ${i * 31}")
    }.toDF("doc_id", "text")
    val hist = corpus.where(col("doc_id") % 2 === 0)
    val fresh = corpus.where(col("doc_id") % 2 === 1)
    val path = new java.io.File(System.getProperty("java.io.tmpdir"),
      s"graft_band_table_spec_${System.nanoTime()}").getPath
    val prevThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      Dedup.writeBandIndexTable(hist, "text", "doc_id", "graft_band_idx",
        nBuckets = 4, seed = 7L)
      Dedup.writeBandIndex(hist, "text", "doc_id", path, seed = 7L)
      val viaTable = Dedup.nearDupAgainstIndexTable(fresh, "text", "doc_id",
        "graft_band_idx", threshold = 0.4, seed = 7L)
        .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
      val viaPath = Dedup.nearDupAgainstIndex(fresh, "text", "doc_id", path,
        threshold = 0.4, seed = 7L)
        .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
      assert(viaTable.nonEmpty && viaTable == viaPath)
      // the point of the bucket layout under the huge-batch plan
      // (broadcastProbe = false -> sort-merge): the index side must come
      // back CO-LOCATED, so the bucketed plan carries exactly one fewer
      // Exchange than the same probe against the path index (whose index
      // side must shuffle)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val plan = Dedup.nearDupAgainstIndexTable(fresh, "text", "doc_id",
        "graft_band_idx", threshold = 0.4, seed = 7L, broadcastProbe = false)
        .queryExecution.executedPlan.toString
      assert(plan.contains("Bucketed: true"), s"index scan must use buckets:\n$plan")
      val planPath = Dedup.nearDupAgainstIndex(fresh, "text", "doc_id", path,
        threshold = 0.4, seed = 7L, broadcastProbe = false)
        .queryExecution.executedPlan.toString
      def exchanges(p: String) = "Exchange".r.findAllIn(p).size
      assert(exchanges(plan) == exchanges(planPath) - 1,
        s"bucketed index side must not shuffle: bucketed=${exchanges(plan)} " +
          s"path=${exchanges(planPath)}\n$plan")
      // the default (deliberate batch broadcast) never moves the index:
      // zero Exchange under the bucketed scan, zero anywhere but the
      // batch side
      val planB = Dedup.nearDupAgainstIndexTable(fresh, "text", "doc_id",
        "graft_band_idx", threshold = 0.4, seed = 7L)
        .queryExecution.executedPlan.toString
      assert(planB.contains("BroadcastExchange"),
        s"default probe plan must broadcast the batch deliberately:\n$planB")
      // parameters ride the catalog schema: mismatched probe rejected
      val e = intercept[IllegalArgumentException] {
        Dedup.nearDupAgainstIndexTable(fresh, "text", "doc_id", "graft_band_idx")
      }
      assert(e.getMessage.contains("seed=7") && e.getMessage.contains("seed=42"))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThresh)
      spark.sql("DROP TABLE IF EXISTS graft_band_idx")
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(new java.io.File(path))
    }
  }

  test("tfidf: exact tf/df counts; rare terms outrank stopwords; top-k bounded") {
    import graft.functions.TfIdf
    val corpus = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the dog sat"),
      (3L, "the zebra ran")).toDF("doc_id", "text")
    val s = TfIdf.docTermScores(corpus, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    val byKey = s.map(x => (x._1, x._2) -> x).toMap
    // tf: "the" twice in doc 1; df: "the" in all 3 docs, "sat" in 2, "zebra" in 1
    assert(byKey((1L, "the"))._3 == 2L && byKey((1L, "the"))._4 == 3L)
    assert(byKey((2L, "sat"))._4 == 2L && byKey((3L, "zebra"))._4 == 1L)
    // smoothed idf: score = tf * (ln((N+1)/(df+1)) + 1), N = 3
    val exp = 1.0 * (math.log(4.0 / 2.0) + 1.0)
    assert(math.abs(byKey((3L, "zebra"))._5 - exp) < 1e-12)
    // rare term outranks the ubiquitous one within its doc
    assert(byKey((3L, "zebra"))._5 > byKey((3L, "the"))._5)
    // top-k bounded per doc, ranked by score then term: doc 1's "the" wins on
    // tf=2 (score exactly 2.0); doc 3 has a 3-way tie at tf=1,df=1 broken by
    // term order -> "ran" first
    val top = TfIdf.topTerms(corpus, "doc_id", "text", 2)
    assert(top.groupBy("id").count().collect().forall(_.getLong(1) <= 2L))
    val top1 = top.where(col("id") === 1L && col("rank") === 1L).head()
    assert(top1.getString(top1.fieldIndex("term")) == "the" &&
      top1.getDouble(top1.fieldIndex("score")) == 2.0)
    val top3 = top.where(col("id") === 3L && col("rank") === 1L).head()
    assert(top3.getString(top3.fieldIndex("term")) == "ran")
  }

  test("connectedComponents: chains, cycles, isolated nodes, and empty edge sets") {
    // chain 1-2-3-4 (diameter forces propagation), triangle 10-11-12,
    // isolated 20
    val pairs = Seq((2L, 1L), (2L, 3L), (3L, 4L), (10L, 11L), (11L, 12L), (10L, 12L))
      .toDF("a", "b")
    val nodes = Seq(1L, 2L, 3L, 4L, 10L, 11L, 12L, 20L).toDF("id")
    val cc = graft.functions.Dedup.connectedComponents(pairs, nodes)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L))
    // no edges at all: every node is its own cluster
    val lone = graft.functions.Dedup.connectedComponents(
      pairs.where(lit(false)), nodes)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(lone.forall { case (k, v) => k == v } && lone.size == 8)
  }

  test("property: connectedComponents equals union-find on random graphs") {
    (1 to 6).foreach { seed =>
      val rng = new scala.util.Random(900L + seed)
      val n = 40 + rng.nextInt(60)
      val ids = (0L until n.toLong).toSeq
      val edges = Seq.fill(rng.nextInt(n))((rng.nextInt(n).toLong, rng.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      // driver union-find oracle
      val parent = scala.collection.mutable.ArrayBuffer.tabulate(n)(identity)
      def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val expected = ids.map(i => i -> find(i.toInt).toLong).toMap
      // union-find fast path (default) AND the distributed path (forced
      // with localEdgeLimit = 0: contraction can never fit a zero cap, so
      // it stalls at the global forest and the pointer-jumping fallback
      // runs) must both match
      val gotLocal = graft.functions.Dedup.connectedComponents(
        edges.toDF("a", "b"), ids.toDF("id"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(gotLocal == expected, s"local seed=$seed n=$n edges=${edges.size}")
      val gotDist = graft.functions.Dedup.connectedComponents(
        edges.toDF("a", "b"), ids.toDF("id"), localEdgeLimit = 0L)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(gotDist == expected, s"dist seed=$seed n=$n edges=${edges.size}")
    }
  }

  test("connectedComponents contraction path: dense graph over the cap contracts to the driver finish") {
    // clique 0..19 (190 edges) + chain 20..29 + isolated 30..34: 199 edges
    // exceed cap 40, but any spanning forest (<= 29 edges) fits — the
    // filtering-contraction passes must shrink to the driver union-find
    // and reproduce the exact min-id components
    val clique = for { a <- 0L until 20L; b <- (a + 1) until 20L } yield (a, b)
    val chain = (20L until 29L).map(i => (i, i + 1))
    val edges = (clique ++ chain).toDF("a", "b").repartition(8)
    val nodes = (0L until 35L).toDF("id")
    val expected = (0L until 35L).map {
      case i if i < 20L => i -> 0L
      case i if i < 30L => i -> 20L
      case i => i -> i
    }.toMap
    val got = graft.functions.Dedup.connectedComponents(edges, nodes,
        localEdgeLimit = 40L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected)
    // same graph through the stalled-forest fallback (cap 0) for parity
    val gotPj = graft.functions.Dedup.connectedComponents(edges, nodes,
        localEdgeLimit = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(gotPj == expected)
  }

  test("tokenNgrams: sliding word windows, deduped, empty under n") {
    import graft.functions.{TextFunctions => TF}
    val r = Seq(("a b c d", 1), ("a b a b a b", 2), ("ab", 3), ("", 4))
      .toDF("t", "id")
      .select(col("id"), TF.tokenNgrams(col("t"), 3).as("ng"))
      .collect().map(x => x.getInt(0) -> x.getSeq[String](1)).toMap
    assert(r(1) == Seq("a b c", "b c d"))
    assert(r(2) == Seq("a b a", "b a b")) // deduped from 4 windows
    assert(r(3).isEmpty && r(4).isEmpty)
  }

  test("tokenNgramHashes: bit-identical to the Column path explode + tokenHash") {
    import graft.functions.{TextFunctions => TF}
    // adversarial fixture: repeats (dedup), multi-space runs, leading/trailing
    // whitespace, short docs, empty, NULL
    val fixture = Seq(
      (1L, "a b c d a b c"), (2L, "  x   y\tz  "), (3L, "solo"),
      (4L, ""), (5L, null.asInstanceOf[String]),
      (6L, "the quick brown fox the quick brown fox"))
      .toDF("doc_id", "text")
    for (n <- Seq(1, 2, 3)) {
      val fast = TF.tokenNgramHashes(fixture, col("doc_id"), col("text"), n)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
      val columnPath = fixture
        .select(col("doc_id"), explode(TF.tokenNgrams(col("text"), n)).as("ng"))
        .select(col("doc_id"), TF.tokenHash(col("ng")), col("ng"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
      assert(fast == columnPath, s"n=$n")
    }
  }

  test("tokenNgramsByKey: bit-identical to the Column path keyed explode") {
    import graft.functions.{TextFunctions => TF}
    val fixture = Seq(
      ("web", "a b c d a b c"), ("web", "  x   y\tz  "), ("books", "solo"),
      ("books", ""), ("code", null.asInstanceOf[String]),
      ("code", "the quick brown fox the quick brown fox"))
      .toDF("source", "text")
    for (n <- Seq(1, 2, 3)) {
      // toSeq not toSet: per-row dedup must also agree on MULTIPLICITY
      // across rows sharing a key (two "web" docs with a common n-gram
      // emit it twice on both paths)
      val fast = TF.tokenNgramsByKey(fixture, col("source"), col("text"), n)
        .collect().map(r => (r.getString(0), r.getString(1))).sorted.toSeq
      val columnPath = fixture
        .select(col("source"), explode(TF.tokenNgrams(col("text"), n)).as("ng"))
        .collect().map(r => (r.getString(0), r.getString(1))).sorted.toSeq
      assert(fast == columnPath, s"n=$n")
    }
  }

  test("redactPii replaces emails and phone-like runs, leaves prose alone") {
    import graft.functions.{TextFunctions => TF}
    val out = Seq("mail me at jo.doe+x@sub.example.org or call +1 (555) 010-7788 now")
      .toDF("t").select(TF.redactPii(col("t"))).head.getString(0)
    assert(out == "mail me at <EMAIL> or call <PHONE> now", out)
    val clean = Seq("plain text, year 2026, pi 3.14").toDF("t")
      .select(TF.redactPii(col("t"))).head.getString(0)
    assert(clean == "plain text, year 2026, pi 3.14")
  }

  test("benchmarkContamination: counts shared token n-grams, skips clean docs") {
    import graft.functions.Dedup
    val bench = Seq((100L, "the quick brown fox jumps")).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "we saw the quick brown fox yesterday"), // shares 2 trigrams
      (2L, "completely unrelated words here"),
      (3L, "quick brown fox jumps high")            // shares 2 trigrams
    ).toDF("doc_id", "text")
    val got = Dedup.benchmarkContamination(corpus, bench, "text", "doc_id", 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 2L, 3L -> 2L), got.toString)
  }

  test("dupSpanFraction: hand-computed coverage, within-doc repeats, short docs, partitioning invariance") {
    import spark.implicits._
    // docs 1 and 2 share the 3-gram "x y z" at positions 2 and 1; doc 3
    // repeats "a a a" INSIDE itself (positions 1 and 4 -> merged coverage
    // [1,4)∪[4,7) = 6 of 6); doc 4 is unique; doc 5 is too short
    val docs = Seq(
      (1L, "q x y z r s"),   // dup window at p=2 covers [2,5) -> 3 of 6
      (2L, "x y z r2 s2"),   // dup window at p=1 covers [1,4) -> 3 of 5
      (3L, "a a a a a a"),   // windows p=1..4 all "a a a" -> covered 6 of 6
      (4L, "u v w only here once"),
      (5L, "xy")).toDF("id", "text")
    val got = graft.functions.Dedup.dupSpanFraction(docs, "id", "text", 3)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got(1L) == ((6L, 3L, 0.5)))
    assert(got(2L) == ((5L, 3L, 0.6)))
    assert(got(3L) == ((6L, 6L, 1.0)))
    assert(got(4L) == ((6L, 0L, 0.0)))
    assert(got(5L) == ((1L, 0L, 0.0)))
    // invariant to physical partitioning
    val rep = graft.functions.Dedup.dupSpanFraction(docs.repartition(7), "id", "text", 3)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(rep == got)
  }

  test("removeDupSpans: both occurrences dropped, merged within-doc runs, short/unique docs pass through") {
    import spark.implicits._
    // same fixture as the dupSpanFraction test: coverage is identical,
    // and the rebuilt text keeps exactly the uncovered positions in order
    val docs = Seq(
      (1L, "q x y z r s"),   // covered [2,5) -> keep "q r s"
      (2L, "x y z r2 s2"),   // covered [1,4) -> keep "r2 s2"
      (3L, "a a a a a a"),   // fully covered -> ""
      (4L, "u v w only here once"),
      (5L, "xy")).toDF("id", "text")
    val got = graft.functions.Dedup.removeDupSpans(docs, "id", "text", 3)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
    assert(got(1L) == ((6L, 3L, "q r s")))
    assert(got(2L) == ((5L, 2L, "r2 s2")))
    assert(got(3L) == ((6L, 0L, "")))
    assert(got(4L) == ((6L, 6L, "u v w only here once")))
    assert(got(5L) == ((1L, 1L, "xy")))
    // n_kept = ntok - covered, always (the two passes agree)
    val frac = graft.functions.Dedup.dupSpanFraction(docs, "id", "text", 3)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    got.foreach { case (id, (ntok, nKept, _)) =>
      assert(ntok - nKept == frac(id), s"doc $id") }
    // invariant to physical partitioning
    val rep = graft.functions.Dedup.removeDupSpans(docs.repartition(7), "id", "text", 3)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
    assert(rep == got)
  }

  test("removeDupSpansKeepOne: canonical min-(doc,pos) occurrence survives, partitioning-invariant") {
    import spark.implicits._
    val docs = Seq(
      (1L, "q x y z r s"),   // holds the canonical "x y z" -> untouched
      (2L, "x y z r2 s2"),   // the later "x y z" occurrence -> covered [1,4)
      (3L, "a a a a a a"),   // "a a a" x4: canonical (3,1) keeps pos 1 only
      (4L, "u v w only here once"),
      (5L, "xy")).toDF("id", "text")
    val got = graft.functions.Dedup.removeDupSpansKeepOne(docs, "id", "text", 3)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
    assert(got(1L) == ((6L, 6L, "q x y z r s"))) // exactly one copy survives
    assert(got(2L) == ((5L, 2L, "r2 s2")))
    assert(got(3L) == ((6L, 1L, "a"))) // self-overlap: canonical window's
    // positions 2,3 fall to the marked occurrences at p=2,3 — keep-one is
    // a window-level guarantee, positions yield to OTHER duplicated windows
    assert(got(4L) == ((6L, 6L, "u v w only here once")))
    assert(got(5L) == ((1L, 1L, "xy")))
    // keep-one removes a subset of the both-occurrences variant, never more
    val both = graft.functions.Dedup.removeDupSpans(docs, "id", "text", 3)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    got.foreach { case (id, (_, nKept, _)) =>
      assert(nKept >= both(id), s"doc $id kept fewer than the both-variant") }
    // the canonical argmin is global and deterministic: invariant to
    // physical partitioning
    val rep = graft.functions.Dedup
      .removeDupSpansKeepOne(docs.repartition(7), "id", "text", 3)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
    assert(rep == got)
  }

  test("decontaminateSpans: benchmark-covered spans removed, merged runs, clean docs untouched") {
    import spark.implicits._
    val bench = Seq((100L, "what is the answer to q seven")).toDF("bid", "btext")
    val corpus = Seq(
      // quotes bench 3-gram "the answer to" at p=3 -> covered [3,6)
      (1L, "we know the answer to that question"),
      // two bench 3-grams overlap ("what is the", "is the answer") ->
      // merged run [1,5) of 6
      (2L, "what is the answer maybe not"),
      (3L, "completely clean document here"),
      (4L, "to q")).toDF("id", "text") // shorter than n: passes through
    val got = graft.functions.Dedup.decontaminateSpans(
        corpus, "id", "text", bench, "btext", 3)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
    assert(got(1L) == ((7L, 4L, "we know that question")))
    assert(got(2L) == ((6L, 2L, "maybe not")))
    assert(got(3L) == ((4L, 4L, "completely clean document here")))
    assert(got(4L) == ((2L, 2L, "to q")))
    // scrubbed corpus has ZERO q54-style hits against the same benchmark
    val rescored = graft.functions.Dedup.benchmarkContamination(
      graft.functions.Dedup.decontaminateSpans(
          corpus, "id", "text", bench, "btext", 3)
        .select(col("id"), col("clean_text").as("text")),
      bench.select(col("btext").as("text")), "text", "id", n = 3)
    assert(rescored.count() == 0L)
  }

  test("editDistance1Pairs: substitutions and insertions found, shared-key distance-2 pairs rejected") {
    import spark.implicits._
    val vocab = Seq("cat", "cst", "cats", "dog", "ab", "ba", "unrelated")
      .map(t => (t, t)).toDF("tid", "tstr")
    val got = graft.functions.Dedup.editDistance1Pairs(vocab, "tid", "tstr")
      .collect().map(r => (r.getString(2), r.getString(3), r.getLong(4))).toSet
    // substitution (cat~cst), insertions (cat~cats, cst~cats? dist 2 — no);
    // ab~ba share deletion keys {a, b} but levenshtein = 2 -> rejected
    assert(got == Set(("cat", "cst", 1L), ("cat", "cats", 1L)))
    // a brute-force reference over the whole fixture: every pair at
    // distance <= 1 is found (deletion neighborhood is complete for d=1)
    val all = Seq("cat", "cst", "cats", "dog", "ab", "ba", "unrelated")
    val brute = (for {
      a <- all; b <- all if a < b
      d = {
        val dp = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
          if (i == 0) j else if (j == 0) i else 0 }
        for (i <- 1 to a.length; j <- 1 to b.length)
          dp(i)(j) = math.min(math.min(dp(i - 1)(j) + 1, dp(i)(j - 1) + 1),
            dp(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
        dp(a.length)(b.length)
      }
      if d <= 1
    } yield (a, b, d.toLong)).toSet
    assert(got == brute)
  }

  test("hashedLinearScore: integer-exact dot product matches a driver-side replica; empty doc scores 0.5") {
    import spark.implicits._
    val docs = Seq((1L, "alpha beta beta gamma"), (2L, ""), (3L, "ALPHA beta")).toDF("id", "text")
    val got = docs.select(col("id"),
        TF.hashedLinearScore(col("text"), dim = 64, salt = "t").as("s"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // driver-side replica of the exact integer formula
    def hmod(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(md.take(15), 16) % TF.HashMod
    }
    def score(text: String): Double = {
      val toks = text.toLowerCase.split("\\s+").filter(_.nonEmpty)
      val raw = toks.map(t =>
        (hmod(s"t:$t") % 64) * 2654435761L % TF.HashMod - TF.HashMod / 2L).sum
      val mean = if (toks.isEmpty) 0.0
        else raw.toDouble / (toks.length.toDouble * (TF.HashMod / 2L).toDouble)
      BigDecimal(1.0 / (1.0 + math.exp(-(0.0 + 4.0 * mean))))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    assert(got(1L) == score("alpha beta beta gamma"))
    assert(got(2L) == 0.5) // empty doc -> sigmoid(0)
    assert(got(3L) == score("ALPHA beta")) // case-folded features
    assert(got.values.forall(v => v > 0.0 && v < 1.0))
  }

  test("linearScoreWithWeights: closed form on a single-bucket model") {
    import spark.implicits._
    // dim = 1: every token hits bucket 0, mean contribution = weights(0)
    val docs = Seq((1L, "a b c"), (2L, "")).toDF("id", "text")
    val got = docs.select(col("id"),
        TF.linearScoreWithWeights(col("text"), Array(2.0), salt = "t").as("s"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val expect = BigDecimal(1.0 / (1.0 + math.exp(-2.0)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(1L) == expect)
    assert(got(2L) == 0.5)
  }

  test("no UDFs: text ops stay codegen expressions (plan contains no BatchEvalPython/ScalaUDF)") {
    val plan = docs.select(TF.fingerprint(col("text")), Dedup.simhash32(col("text")))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("UDF"))
  }

  // ------------------------------------------------------- bpePairStats

  test("bpePairStats: frequency-weighted pairs with the end-of-word marker, deterministic tie rank") {
    // words: aa (x1), ab (x2; once via 'Ab!' -> lowercase + punct strip)
    val df = Seq("aa ab", "Ab!").toDF("text")
    val got = TF.bpePairStats(df, "text", 3)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    // (a,b):2, (b,</w>):2, then cnt-1 ties: (a,</w>) before (a,a)
    assert(got.toSeq == Seq(
      ("a", "b", 2L, 1L), ("b", "</w>", 2L, 2L), ("a", "</w>", 1L, 3L)))
    // a pair occurring twice in ONE word counts twice per occurrence
    val dbl = TF.bpePairStats(Seq("aaa").toDF("text"), "text", 1).collect()(0)
    assert((dbl.getString(0), dbl.getString(1), dbl.getLong(2)) == (("a", "a", 2L)))
    intercept[IllegalArgumentException] { TF.bpePairStats(df, "text", 0) }
  }

  // --------------------------------------------------- blockedEditPairs

  test("blockedEditPairs: in-block pairs within threshold; blocking miss and over-threshold excluded") {
    val df = Seq(
      (1L, "abcdefgh"),  // vs 2: dist 1 (same block)
      (2L, "abcdefxh"),
      (3L, "xbcdefgh"),  // dist 1 from 1 but differs INSIDE the prefix -> blocked away
      (4L, "abcdzzzz"),  // same block as 1/2, dist 4 -> over threshold
      (5L, null.asInstanceOf[String])).toDF("id", "s")
    val got = graft.functions.Dedup.blockedEditPairs(df, "id", "s", maxDist = 2, prefixLen = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq((1L, 2L, 1L)))
    intercept[IllegalArgumentException] {
      graft.functions.Dedup.blockedEditPairs(df, "id", "s", 0, 4) }
    intercept[IllegalArgumentException] {
      graft.functions.Dedup.blockedEditPairs(df, "id", "s", 2, 0) }
  }

  test("blockedEditPairs: candidate plan is a block-keyed equi-join, never a nested loop") {
    val df = Seq((1L, "abcdefgh"), (2L, "abcdefxh")).toDF("id", "s")
    val plan = graft.functions.Dedup.blockedEditPairs(df, "id", "s", 2, 4)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop") && !plan.contains("CartesianProduct"))
  }

  test("band-index tombstone delete == rebuild over survivors; compaction reclaims and preserves") {
    val corpus = (0L until 60L).map { i =>
      val base = s"the quick brown fox jumps over the lazy dog number ${i % 7} again and again"
      (i, if (i % 3 == 0) base else base + s" tail$i extra words ${i * 31}")
    }.toDF("doc_id", "text")
    val hist = corpus.where(col("doc_id") % 2 === 0)
    val dead = hist.where(col("doc_id") % 6 === 0).select("doc_id")
    val survivors = hist.where(col("doc_id") % 6 =!= 0)
    val fresh = corpus.where(col("doc_id") % 2 === 1)
    val tmp = System.getProperty("java.io.tmpdir")
    val pDel = new java.io.File(tmp, s"graft_bidx_del_${System.nanoTime()}").getPath
    val pSurv = new java.io.File(tmp, s"graft_bidx_surv_${System.nanoTime()}").getPath
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles).foreach(_.foreach(rm)); f.delete(); ()
    }
    def probe(p: String) =
      Dedup.nearDupAgainstIndex(fresh, "text", "doc_id", p, threshold = 0.4)
        .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    try {
      // deleting from a directory that holds no index is rejected
      val e0 = intercept[IllegalArgumentException] {
        Dedup.deleteFromBandIndex(dead, "doc_id", pDel)
      }
      assert(e0.getMessage.contains("no band index"))
      Dedup.writeBandIndex(hist, "text", "doc_id", pDel)
      Dedup.writeBandIndex(survivors, "text", "doc_id", pSurv)
      val full = probe(pDel)
      Dedup.deleteFromBandIndex(dead, "doc_id", pDel)
      val afterDelete = probe(pDel)
      val rebuilt = probe(pSurv)
      assert(afterDelete.nonEmpty && afterDelete == rebuilt,
        "tombstoned probe must equal the rebuild over the survivors")
      assert(full != afterDelete, "the delete must actually remove matches")
      assert(full.keySet.exists { case (_, idx) => idx % 6 == 0 },
        "fixture check: the deleted docs matched before the delete")
      assert(!afterDelete.keySet.exists { case (_, idx) => idx % 6 == 0 })
      // the streaming bridge sees the same mask
      val bridged = Dedup.loadBandIndex(spark, pDel)
        .select("corpus_id").distinct().collect().map(_.getLong(0)).toSet
      assert(!bridged.exists(_ % 6 == 0))
      // plain index reads never see the underscore-prefixed tombstone set
      assert(spark.read.parquet(pDel).columns.toSet ==
        Set("id", "hs", "bhs", "band", "bh"))
      // compaction: physical rows drop to the survivor rebuild's count,
      // the tombstone set vanishes, the probe result is unchanged
      Dedup.compactBandIndex(spark, pDel)
      assert(Dedup.bandTombstones(spark, pDel).isEmpty)
      assert(spark.read.parquet(pDel).count() == spark.read.parquet(pSurv).count())
      assert(probe(pDel) == rebuilt)
      // params survive the compaction swap: a mismatched probe still rejects
      val e1 = intercept[IllegalArgumentException] {
        Dedup.nearDupAgainstIndex(fresh, "text", "doc_id", pDel, seed = 7L)
      }
      assert(e1.getMessage.contains("seed=7"))
      // compacting with nothing tombstoned is a no-op
      Dedup.compactBandIndex(spark, pDel)
      assert(probe(pDel) == rebuilt)
      // the bucketed-TABLE variant: same delete ≡ rebuild contract,
      // compaction preserves probes and the bucket layout
      Dedup.writeBandIndexTable(hist, "text", "doc_id",
        "graft_band_del_tbl", nBuckets = 4)
      Dedup.deleteFromBandIndexTable(dead, "doc_id", "graft_band_del_tbl")
      def probeT() = Dedup.nearDupAgainstIndexTable(fresh, "text", "doc_id",
        "graft_band_del_tbl", threshold = 0.4)
        .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
      assert(probeT() == rebuilt)
      Dedup.compactBandIndexTable(spark, "graft_band_del_tbl")
      assert(!spark.catalog.tableExists("graft_band_del_tbl_tombstones"))
      assert(probeT() == rebuilt)
      assert(spark.table("graft_band_del_tbl").count() ==
        spark.read.parquet(pSurv).count())
    } finally {
      rm(new java.io.File(pDel)); rm(new java.io.File(pSurv))
      Seq("graft_band_del_tbl", "graft_band_del_tbl_tombstones",
        "graft_band_del_tbl_stage")
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    }
  }
}
