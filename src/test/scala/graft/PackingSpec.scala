package graft

import org.apache.spark.sql.functions._
import graft.functions.{Packing, TextFunctions => TF}

class PackingSpec extends SparkSuite {
  import spark.implicits._

  // docs with known token counts: doc i has i tokens ("t t t ...")
  lazy val docs = (0L until 20L)
    .map(i => (i, Seq.fill(i.toInt)("t").mkString(" ")))
    .toDF("id", "text")

  test("packStream: contiguous stream layout within each bucket") {
    val p = Packing.packStream(docs, "id", TF.tokenCount(col("text")),
      capacity = 10, nBuckets = 2)
    assert(p.count() == 20)
    // stream invariant: within a bucket, ordered by id, each doc starts
    // exactly where the previous one ended (cum tokens mod capacity)
    val rows = p.select("bucket", "id", "n_tok", "pack_first", "pack_offset",
        "pack_last", "n_packs")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
      .groupBy(_._1)
    for ((_, docsInBucket) <- rows) {
      var cum = 0L
      for ((_, _, nTok, first, off, last, nPacks) <- docsInBucket.sortBy(_._2)) {
        assert(first == cum / 10, s"pack_first mismatch at cum=$cum")
        assert(off == cum % 10, s"pack_offset mismatch at cum=$cum")
        if (nTok > 0) {
          assert(last == (cum + nTok - 1) / 10)
          assert(nPacks == last - first + 1)
        } else {
          assert(nPacks == 0 && last == first)
        }
        cum += nTok
      }
    }
    // empty doc (id=0) spans no packs
    assert(p.where(col("id") === 0).select("n_packs").as[Long].head() == 0L)
  }

  test("packStream: deterministic across runs and stable bucket routing") {
    val a = Packing.packStream(docs, "id", TF.tokenCount(col("text")), 10, 2)
    val b = Packing.packStream(docs, "id", TF.tokenCount(col("text")), 10, 2)
    assert(a.except(b).count() == 0 && b.except(a).count() == 0)
    intercept[IllegalArgumentException] {
      Packing.packStream(docs, "id", TF.tokenCount(col("text")), 0, 2)
    }
  }

  test("packStream: negative token counts clamp to 0 (streaming-equivalence rule)") {
    // a negative count must not move the stream cursor backwards — the
    // streaming twin clamps, so the batch layout must match it
    val neg = Seq((1L, 5L), (2L, -3L), (3L, 4L)).toDF("id", "raw")
    val p = Packing.packStream(neg, "id", col("raw"), capacity = 10, nBuckets = 1)
      .select("id", "n_tok", "pack_first", "pack_offset")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(p(2L) == ((0L, 0L, 5L)), s"negative count not clamped: ${p(2L)}")
    assert(p(3L) == ((4L, 0L, 5L)), s"cursor moved backwards: ${p(3L)}")
  }

  test("packStream: rejects inputs already carrying reserved output names") {
    // "bucket" would be silently overwritten before anything reads it
    val clash = Seq((1L, 3L, 9L)).toDF("id", "raw", "bucket")
    val e = intercept[IllegalArgumentException] {
      Packing.packStream(clash, "id", col("raw"), capacity = 10)
    }
    assert(e.getMessage.contains("bucket"), e.getMessage)
    // an input n_tok NOT read by the token expression is also a clash...
    val e2 = intercept[IllegalArgumentException] {
      Packing.packStream(Seq((1L, 3L, 9L)).toDF("id", "raw", "n_tok"),
        "id", col("raw"), capacity = 10)
    }
    assert(e2.getMessage.contains("n_tok"), e2.getMessage)
    // ...but the natural "my count column is already called n_tok" works
    val ok = Packing.packStream(Seq((1L, 7L)).toDF("id", "n_tok"),
      "id", col("n_tok"), capacity = 10)
    assert(ok.select("n_tok").as[Long].head() == 7L)
  }

  test("chunkByTokens: exact chunk grid, clamped tail, empty docs dropped") {
    val c = Packing.chunkByTokens(docs, "id", "text", window = 5, stride = 3)
    // doc with n tokens yields 1 + ceil(max(n-5,0)/3) chunks; n=0 yields none
    val counts = c.groupBy("id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(!counts.contains(0L))
    for (n <- 1L until 20L) {
      val expected = 1 + math.ceil(math.max(n - 5, 0) / 3.0).toLong
      assert(counts(n) == expected, s"n=$n got ${counts(n)} want $expected")
    }
    // tail chunk is clamped: for n=7, chunk 1 covers tokens 4..7 (4 tokens)
    val tail = c.where(col("id") === 7 && col("chunk_idx") === 1)
      .select("chunk_tok", "chunk_text").head()
    assert(tail.getInt(0) == 4 && tail.getString(1) == "t t t t")
    // full chunks carry exactly `window` tokens
    assert(c.where(col("chunk_idx") === 0 && col("id") >= 5)
      .select("chunk_tok").as[Int].collect().forall(_ == 5))
    intercept[IllegalArgumentException] {
      Packing.chunkByTokens(docs, "id", "text", window = 5, stride = 6)
    }
  }

  test("chunkByTokens: consecutive chunks overlap by window - stride tokens") {
    val text = (1 to 12).map(i => s"w$i").mkString(" ")
    val one = Seq((1L, text)).toDF("id", "text")
    val chunks = Packing.chunkByTokens(one, "id", "text", window = 5, stride = 3)
      .orderBy("chunk_idx").select("chunk_text").as[String].collect()
    assert(chunks.sameElements(Array(
      "w1 w2 w3 w4 w5", "w4 w5 w6 w7 w8", "w7 w8 w9 w10 w11", "w10 w11 w12")))
  }

  test("packWhole: next-fit-decreasing fill, oversize isolation, matches a driver replica, partitioning-invariant") {
    // single bucket (nBuckets = 1) so the hand layout is checkable:
    // sizes desc = 90, 80, 70, 40, 30, 0 with capacity 100 ->
    // packs [90], [80], [70+30? no: NFD is NEXT-fit: 70 then 40 closes?]
    // walk: 90 (p0 f90) | 80 overflows -> p1 f80 | 70 -> p2 f70 |
    // 40 overflows (70+40>100) -> p3 f40 | 30 fits (p3 f70) |
    // 0 fits (p3, off 70)
    val docs = Seq(
      (1L, 90L), (2L, 80L), (3L, 70L), (4L, 40L), (5L, 30L), (6L, 0L))
      .toDF("id", "n")
    val got = graft.functions.Packing.packWhole(docs, "id", col("n"),
        capacity = 100L, nBuckets = 1)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(3), r.getLong(4), r.getBoolean(5))))
      .toMap
    assert(got(1L) == ((0L, 0L, false)))
    assert(got(2L) == ((1L, 0L, false)))
    assert(got(3L) == ((2L, 0L, false)))
    assert(got(4L) == ((3L, 0L, false)))
    assert(got(5L) == ((3L, 40L, false)))
    assert(got(6L) == ((3L, 70L, false)))
    // an oversize doc owns its pack and is flagged; the next doc closes it
    val big = Seq((1L, 150L), (2L, 10L)).toDF("id", "n")
    val g2 = graft.functions.Packing.packWhole(big, "id", col("n"),
        capacity = 100L, nBuckets = 1)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(3), r.getLong(4), r.getBoolean(5))))
      .toMap
    assert(g2(1L) == ((0L, 0L, true)))
    assert(g2(2L) == ((1L, 0L, false)))
    // multi-bucket run matches a driver-side replica of the same rule and
    // is invariant to input partitioning; no pack exceeds capacity unless
    // it holds a single oversize doc
    val rng = new scala.util.Random(23L)
    val many = (1L to 300L).map(i => (i, rng.nextInt(120).toLong))
      .toDF("id", "n")
    def run(df: org.apache.spark.sql.DataFrame) =
      graft.functions.Packing.packWhole(df, "id", col("n"),
          capacity = 100L, nBuckets = 4)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getBoolean(5)))
        .sortBy(_._1)
    val a = run(many)
    assert(a.sameElements(run(many.repartition(13))))
    val replica = a.map(t => (t._1, t._2, t._3)).toSeq
      .groupBy(_._2).toSeq.flatMap { case (b, rows) =>
        var p = 0L; var f = 0L
        rows.sortBy(t => (-t._3, t._1)).map { case (id, _, n) =>
          if (f + n > 100L && f > 0) { p += 1; f = 0 }
          val off = f; f += n
          (id, b, n, p, off, n > 100L)
        }
      }.toSeq.sortBy(_._1)
    assert(a.toSeq == replica)
    val fills = a.groupBy(t => (t._2, t._4)).map { case (_, rows) =>
      (rows.map(_._3).sum, rows.exists(_._6)) }
    fills.foreach { case (tot, over) => assert(over || tot <= 100L) }
  }

  test("unigramSurprisal: exact sorted-fold mean against hand-computed values") {
    val corpus = Seq((1L, "a a b"), (2L, "a c")).toDF("id", "text")
    val s = TF.unigramSurprisal(corpus, "id", "text").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // N=5, n_a=3, n_b=1, n_c=1; fold is 0.0 + contributions in term order —
    // the assertion is BIT-equality, pinning the documented determinism
    val d1 = (0.0 + 2.0 * math.log(5.0 / 3.0) + 1.0 * math.log(5.0 / 1.0)) / 3.0
    val d2 = (0.0 + 1.0 * math.log(5.0 / 3.0) + 1.0 * math.log(5.0 / 1.0)) / 2.0
    assert(s(1L) == ((3L, d1)), s"got ${s(1L)} want ($d1)")
    assert(s(2L) == ((2L, d2)), s"got ${s(2L)} want ($d2)")
    // rarer vocabulary scores strictly higher
    assert(s(2L)._2 > s(1L)._2)
  }

  test("bpeTrain: matches a driver-side reference for 6 rounds; greedy-left run handling; early stop") {
    // pure-driver reference of the same algorithm (word-frequency table,
    // (cnt desc, pair asc) argmax, greedy-left rewrite)
    def reference(texts: Seq[String], rounds: Int): Seq[(Long, String, String, String, Long)] = {
      var vocab: Map[Vector[String], Long] = texts
        .flatMap("[a-z0-9]+".r.findAllIn(_).toSeq)
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
        .map { case (w, f) => (w.map(_.toString).toVector :+ "</w>") -> f }
      val out = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, String, Long)]
      var r = 0
      var done = false
      while (r < rounds && !done) {
        val counts = scala.collection.mutable.Map.empty[(String, String), Long]
        vocab.foreach { case (syms, f) =>
          syms.sliding(2).filter(_.size == 2).foreach { pr =>
            counts((pr(0), pr(1))) = counts.getOrElse((pr(0), pr(1)), 0L) + f }
        }
        if (counts.isEmpty) done = true
        else {
          val ((a, b), n) = counts.toSeq.minBy { case ((x, y), c) => (-c, x, y) }
          r += 1
          out += ((r.toLong, a, b, a + b, n))
          vocab = vocab.map { case (syms, f) =>
            val buf = scala.collection.mutable.ArrayBuffer.empty[String]
            var i = 0
            while (i < syms.length) {
              if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
                buf += (a + b); i += 2
              } else { buf += syms(i); i += 1 }
            }
            buf.toVector -> f
          }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
        }
      }
      out.toSeq
    }
    val texts = Seq("the cat sat on the mat", "the cats sat", "a mat on a cat",
      "aaa aaab the the", "banana bandana")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val got = TF.bpeTrain(df, "text", 6)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4))).toSeq.sortBy(_._1)
    assert(got == reference(texts, 6), s"got $got\nwant ${reference(texts, 6)}")
    // greedy-left on same-symbol runs: "aaa" under (a,a) -> [aa, a], so a
    // second (a,a) round cannot re-merge the leftover with anything
    val runs = Seq((1L, "aaaa aaaa aaa")).toDF("id", "text")
    val g2 = TF.bpeTrain(runs, "text", 2)
      .collect().map(r => (r.getString(1), r.getString(2))).toSeq
    assert(g2 == reference(Seq("aaaa aaaa aaa"), 2).map(t => (t._2, t._3)))
    // early stop: single-char words exhaust after the </w> merges
    val tiny = Seq((1L, "a b")).toDF("id", "text")
    assert(TF.bpeTrain(tiny, "text", 10).count() <= 2L)
  }

  test("bpeEncode: learned-order greedy application, hand-checked symbol counts") {
    // merges (a,b)->ab then (ab,c)->abc: "abc" encodes to [abc, </w>] (2),
    // "ab" to [ab, </w>] (2), "ba" to [b, a, </w>] (3); "cab" -> c ab </w>
    val d = Seq((1L, "abc ab"), (2L, "ba cab")).toDF("id", "text")
    val got = TF.bpeEncode(d, "id", "text",
        Seq(("a", "b"), ("ab", "c")))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got(1L) == ((2L, 4L)), got.toString)   // [abc </w>] + [ab </w>]
    assert(got(2L) == ((2L, 6L)), got.toString)   // [b a </w>] + [c ab </w>]
    // merge ORDER matters: applying (b,c) before (a,b) blocks ab in "abc"
    val g2 = TF.bpeEncode(Seq((1L, "abc")).toDF("id", "text"),
        "id", "text", Seq(("b", "c"), ("a", "b")))
      .collect().map(r => (r.getLong(1), r.getLong(2))).head
    assert(g2 == ((1L, 3L))) // [a, bc, </w>]
  }

  test("crossSurprisal: add-one scoring against a reference LM, OOV ceiling, hand-computed bit equality") {
    val ref = Seq((10L, "a a b")).toDF("id", "text")   // N=3, V=2
    val tgt = Seq((1L, "a b"), (2L, "a z z")).toDF("id", "text")
    val s = TF.crossSurprisal(ref, tgt, "id", "text").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    // smoothed: P ~ (n_t + 1) / (N + V + 1) with N+V+1 = 6; a -> n=2,
    // b -> n=1, z unseen -> n=0 (the ln(6) ceiling). per-term round 6 dp,
    // then the sorted 0.0-seeded fold — BIT-equality pins determinism
    def r6(x: Double): Double = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val d1 = (0.0 + r6(1.0 * StrictMath.log(6.0 / 3.0)) +
      r6(1.0 * StrictMath.log(6.0 / 2.0))) / 2.0
    val d2 = (0.0 + r6(1.0 * StrictMath.log(6.0 / 3.0)) +
      r6(2.0 * StrictMath.log(6.0 / 1.0))) / 3.0
    assert(s(1L) == ((2L, 0L, d1)), s"got ${s(1L)} want $d1")
    assert(s(2L) == ((3L, 2L, d2)), s"got ${s(2L)} want $d2")
    // the off-distribution doc scores strictly higher
    assert(s(2L)._3 > s(1L)._3)
    // self-scoring a reference doc gives the lowest-possible profile for
    // its terms; empty-token target docs emit no row
    val empty = Seq((3L, "   ")).toDF("id", "text")
    assert(TF.crossSurprisal(ref, empty, "id", "text").count() == 0L)
  }

  test("bigramSurprisal: exact sorted-fold mean of -ln P(w2|w1); short docs dropped") {
    val corpus = Seq((1L, "a b a b"), (2L, "a c"), (3L, "z")).toDF("id", "text")
    val s = TF.bigramSurprisal(corpus, "id", "text").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    // corpus bigrams: "a b"x2, "b a"x1, "a c"x1; ctx a=3, b=1.
    // per-term round 6 dp (engine-stability guard), then the sorted fold
    // from 0.0 — BIT-equality pins determinism. Spark's log is
    // StrictMath.log (differs from Math.log by 1 ulp on e.g. ln(3)).
    def r6(x: Double): Double = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val d1 = (0.0 + r6(2.0 * StrictMath.log(3.0 / 2.0)) +
      r6(1.0 * StrictMath.log(1.0 / 1.0))) / 3.0
    val d2 = (0.0 + r6(1.0 * StrictMath.log(3.0 / 1.0))) / 1.0
    assert(s(1L) == ((3L, d1)), s"got ${s(1L)} want $d1")
    assert(s(2L) == ((1L, d2)), s"got ${s(2L)} want $d2")
    assert(!s.contains(3L)) // one token -> no bigram -> no row
    // the common transition scores below the rare one
    assert(s(1L)._2 < s(2L)._2)
  }

  test("topNgrams: document frequency with deterministic ties") {
    val corpus = Seq(
      (1L, "a b a b"),   // bigrams: {a b, b a}
      (2L, "a b c"),     // {a b, b c}
      (3L, "b c d"),     // {b c, c d}
      (4L, "")
    ).toDF("id", "text")
    val top = TF.topNgrams(corpus, "text", n = 2, k = 3).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    // "a b" and "b c" tie at 2, break lexicographically; then ties at 1
    assert(top.sameElements(Array(("a b", 2L), ("b c", 2L), ("b a", 1L))))
  }

  test("wordpieceEncode: greedy longest-match, ## continuation, whole-word UNK bail, doc reassembly") {
    val vocab = Seq("un", "##aff", "##able", "##le", "u", "n",
      "##a", "##f", "##b", "##l", "##e", "b", "##ad")
    val docs = Seq(
      (1L, "Unaffable unaffable!"),  // two occurrences of one distinct word
      (2L, "bad xyz"),               // b ##ad; xyz has no 'x' piece -> [UNK]
      (3L, "")                       // no words -> no output row
    ).toDF("doc_id", "text")
    val got = graft.functions.TextFunctions
      .wordpieceEncode(docs, "doc_id", "text", vocab, maxPieceLen = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getString(4))).sortBy(_._1)
    assert(got.toSeq == Seq(
      // greedy: "un" beats "u"; "##aff" beats "##a"; "##able" beats "##a"
      (1L, 2L, 0L, 6L, "un ##aff ##able un ##aff ##able"),
      (2L, 2L, 1L, 3L, "b ##ad [UNK]")))
    intercept[IllegalArgumentException] {
      graft.functions.TextFunctions.wordpieceEncode(docs, "doc_id", "text", Nil)
    }
  }

  test("wordpieceVocab: weighted substring forms, char totality, top-k ties, dense ids") {
    val docs = Seq((1L, "ab AB"), (2L, "b")).toDF("doc_id", "text")
    // words: ab (f=2), b (f=1). forms: a:2, ab:2, ##b:2 (inside ab), b:1.
    val got = graft.functions.TextFunctions
      .wordpieceVocab(docs, "text", k = 1, maxPieceLen = 2)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sortBy(_._1)
    // chars always survive; k=1 keeps only the top multi-char piece (ab).
    // ids are dense in piece order: '##b' < 'a' < 'ab' < 'b' (ASCII).
    assert(got.toSeq == Seq(
      (1L, "##b", 2L), (2L, "a", 2L), (3L, "ab", 2L), (4L, "b", 1L)))
    // encode under its own vocab is total: no [UNK] on the training corpus
    val enc = graft.functions.TextFunctions.wordpieceEncode(
      docs, "doc_id", "text", got.map(_._2).toSeq, maxPieceLen = 2)
      .agg(sum("n_unk")).head.getLong(0)
    assert(enc == 0L)
  }

  test("unigramEncode: Viterbi max-score split, longer-piece tie rule, UNK bail, doc reassembly") {
    val scores = Map("ab" -> -100L, "a" -> -300L, "b" -> -400L,
      "c" -> -500L, "abc" -> -150L, "bc" -> -200L)
    val docs = Seq(
      (1L, "abc abcb"),  // abc: whole piece beats every split (-150);
                         // abcb: abc+b (-550) beats a+bc+b (-900)
      (2L, "ax b")       // 'x' not in vocab -> whole-word [UNK]
    ).toDF("doc_id", "text")
    val got = graft.functions.TextFunctions
      .unigramEncode(docs, "doc_id", "text", scores, maxPieceLen = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getString(4))).sortBy(_._1)
    assert(got.toSeq == Seq(
      (1L, 2L, 0L, 3L, "abc abc b"),
      (2L, 2L, 1L, 2L, "[UNK] b")))
    // equal path scores prefer the longer final piece: a+a == aa at -200
    val tie = graft.functions.TextFunctions.unigramEncode(
      Seq((1L, "aa")).toDF("doc_id", "text"),
      "doc_id", "text", Map("a" -> -100L, "aa" -> -200L), 2)
      .head.getString(4)
    assert(tie == "aa")
    intercept[IllegalArgumentException] {
      graft.functions.TextFunctions.unigramEncode(docs, "doc_id", "text",
        Map.empty[String, Long]) }
  }

  test("unigramTrain: seeded counts, one EM round reassigns mass, scores replay a driver replica") {
    val docs = Seq((1L, "ab AB b")).toDF("doc_id", "text")
    // words: ab (f=2), b (f=1); seeds: a:2, b:3, ab:2 (top-1 multi)
    // scores0: ab = a = round(ln(2/7)e6) = -1252763 -> "ab" segments whole
    // M1: ab:2, b:1, char floor a:1 -> total 4
    val got = graft.functions.TextFunctions
      .unigramTrain(docs, "text", k = 1, maxPieceLen = 2, rounds = 1)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq(
      (1L, "a", 1L, -1386294L),
      (2L, "ab", 2L, -693147L),
      (3L, "b", 1L, -1386294L)))
    // a second round is a fixed point here: same segmentation, same counts
    val got2 = graft.functions.TextFunctions
      .unigramTrain(docs, "text", k = 1, maxPieceLen = 2, rounds = 2)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(got2.toSeq == got.toSeq)
    // encode under the trained scores is total on the training corpus
    val scores = got.map(r => r._2 -> r._4).toMap
    val enc = graft.functions.TextFunctions.unigramEncode(
      docs, "doc_id", "text", scores, 2).head
    assert((enc.getLong(1), enc.getLong(2), enc.getString(4)) ==
      ((3L, 0L, "ab ab b")))
  }

  test("fixedLenSequences: windows in order, last pads, n_real exact, empty drops") {
    val docs = Seq(
      (1L, "10,11,12,13,14"), // 5 ids, seqLen 2 -> 3 windows, last pads 1
      (2L, "7,8"),            // exactly one full window
      (3L, "9"),              // one window, pads 1
      (4L, "")                // empty id stream -> no rows
    ).toDF("doc_id", "token_ids")
    val got = graft.functions.Packing
      .fixedLenSequences(docs, "doc_id", "token_ids", seqLen = 2, padId = -1L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
      .sortBy(x => (x._1, x._2))
    assert(got.toSeq == Seq(
      (1L, 0L, "10,11", 2L), (1L, 1L, "12,13", 2L), (1L, 2L, "14,-1", 1L),
      (2L, 0L, "7,8", 2L),
      (3L, 0L, "9,-1", 1L)))
    intercept[IllegalArgumentException] {
      graft.functions.Packing.fixedLenSequences(docs, "doc_id", "token_ids", 0, -1L)
    }
    // no shuffle: the window layer runs inside the scan stage
    val plan = graft.functions.Packing
      .fixedLenSequences(docs, "doc_id", "token_ids", 2, -1L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"expected shuffle-free plan:\n$plan")
  }
}
