package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * tokenization, token counting, language ID, quality scoring, document
  * fingerprinting. All pure Catalyst column expressions (codegen'd, no UDFs)
  * so they run inside whole-stage codegen over 100 TB scans.
  *
  * Cross-engine determinism: token hashing goes through md5 (identical in
  * every engine) — the first 15 hex chars parsed as a 60-bit integer — rather
  * than engine-specific hash functions, so results are exactly reproducible
  * by the DuckDB oracle.
  */
object TextFunctions {

  /** Modulus for rolling/perm hashes: fits products in 63 bits. */
  val HashMod = 1000000007L

  /** Whitespace tokens, empty strings dropped. */
  def tokens(c: Column): Column =
    filter(split(c, "\\s+"), t => t =!= lit(""))

  def tokenCount(c: Column): Column = size(tokens(c))

  /** BPE-ish token count: word pieces + isolated punctuation. */
  def bpeTokenCount(c: Column): Column =
    size(regexp_extract_all(c, lit("\\w+|[^\\w\\s]"), lit(0)))

  /** 60-bit md5-derived token hash (deterministic across engines). */
  def tokenHash(t: Column): Column =
    conv(substring(md5(t), 1, 15), 16, 10).cast("long")

  /** md5 hex, first 15 chars as a 60-bit int — the JVM replica of
    * [[tokenHash]] (`conv(substr(md5(t),1,15),16,10)`), shared by every
    * imperative fast path so the parity-critical bit packing lives in one
    * place. DuckDB renders it as `('0x'||substr(md5(t),1,15))::BIGINT`. */
  private[graft] def md5H60(md: java.security.MessageDigest, s: String): Long = {
    val d = md.digest(s.getBytes("UTF-8"))
    var v = 0L
    var i = 0
    while (i < 8) { // 7.5 bytes = 15 hex chars
      val b = d(i) & 0xff
      v = if (i < 7) (v << 8) | b else (v << 4) | (b >>> 4)
      i += 1
    }
    v
  }

  /** tokenHash reduced mod [[HashMod]] — safe in 64-bit products. */
  def tokenHashMod(t: Column): Column = tokenHash(t) % HashMod

  /** Character n-grams (positions 1..len-n+1); empty for strings shorter
    * than n (guarded: Spark's `sequence(1, 0)` counts DOWN, not empty). */
  def charNGrams(c: Column, n: Int): Column =
    when(length(c) >= n,
      transform(sequence(lit(1), length(c) - (n - 1)), i => c.substr(i, lit(n))))
      .otherwise(array().cast("array<string>"))

  /** Distinct lowercase character shingles — the near-dup unit. */
  def shingles(c: Column, n: Int): Column = array_distinct(charNGrams(lower(c), n))

  /** n-gram Jaccard similarity of two documents' shingle sets. */
  def ngramJaccard(a: Column, b: Column, n: Int): Column = {
    val sa = shingles(a, n)
    val sb = shingles(b, n)
    size(array_intersect(sa, sb)).cast("double") / size(array_union(sa, sb))
  }

  /** Stopword tables for the n-gram/stopword language heuristic. Order is
    * the tie-break precedence. */
  val LangStopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "that"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "zu"),
    "fr" -> Seq("le", "la", "les", "et", "est", "une", "que", "des"),
    "es" -> Seq("el", "los", "las", "y", "es", "una", "que", "de"),
    "zh" -> Seq("的", "了", "是", "我", "不", "在", "有", "他"))

  /** Per-language stopword-hit counts (distinct hits, like list_intersect). */
  def langScore(c: Column, lang: String): Column = {
    val words = LangStopwords.toMap.apply(lang)
    size(array_intersect(tokens(lower(c)), array(words.map(lit): _*)))
  }

  /** Predicted language: argmax stopword hits, precedence order on ties,
    * "und" (undetermined) when nothing hits. */
  def langId(c: Column): Column = {
    val scores = LangStopwords.map { case (l, _) => l -> langScore(c, l) }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldRight(lit("und"): Column) { case ((l, s), acc) =>
      when(s === best && s > 0, lit(l)).otherwise(acc)
    }
  }

  /** Heuristic quality score in [0,1]: length signal (up to ~100 tokens),
    * low punctuation density, sane mean token length. Deterministic integer
    * ratios → identical across engines. */
  def qualityScore(c: Column): Column = {
    val nTok = tokenCount(c).cast("double")
    val nChars = length(c).cast("double")
    val punct = length(regexp_replace(c, "[\\w\\s]", "")).cast("double")
    val avgTok = when(nTok > 0, nChars / nTok).otherwise(lit(0.0))
    round(
      least(nTok / 100.0, lit(1.0)) * 0.4 +
      (lit(1.0) - least(punct / greatest(nChars, lit(1.0)) * 5.0, lit(1.0))) * 0.3 +
      when(avgTok >= 3.0 && avgTok <= 10.0, lit(1.0)).otherwise(lit(0.0)) * 0.3,
      6)
  }

  /** Feature-hashing linear classifier score in (0,1) — the fastText-style
    * model-based quality filter shape: every lowercase token hashes into
    * one of `dim` feature buckets, the bucket weights dot the document's
    * token counts, and the logit maps through a sigmoid. The per-doc dot
    * product is a PURE INTEGER sum (weights are integer-valued by
    * construction below), so it is exact in any engine and any addition
    * order; the only float ops are the final normalize + sigmoid on that
    * agreed integer, rounded to 6 dp — the q59/q74 exactness discipline.
    *
    * The default weights are a deterministic multiplicative-hash formula,
    * `w(b) = (b * 2654435761) mod HashMod - HashMod/2` — a stand-in with
    * the exact plumbing of a trained model (no trained weights ship in
    * this library); swap in real weights with [[linearScoreWithWeights]].
    * Zero shuffle: one codegen'd fold over the token array, fuses into the
    * scan. Empty docs score sigmoid(bias). */
  def hashedLinearScore(c: Column, dim: Int, salt: String = "qclf",
      bias: Double = 0.0, scale: Double = 4.0): Column = {
    require(dim >= 1, s"hashedLinearScore requires dim >= 1, got $dim")
    val half = HashMod / 2L
    val raw = aggregate(tokens(lower(c)), lit(0L), (acc, t) =>
      acc + ((tokenHashMod(concat(lit(s"$salt:"), t)) % dim) * 2654435761L
        % HashMod - half))
    val nTok = tokenCount(c)
    val mean = when(nTok > 0, raw.cast("double") /
      (nTok.cast("double") * half.toDouble)).otherwise(lit(0.0))
    round(lit(1.0) / (lit(1.0) + exp(-(lit(bias) + lit(scale) * mean))), 6)
  }

  /** [[hashedLinearScore]] with REAL model weights: `weights(b)` is the
    * trained coefficient of feature bucket `b` (`dim = weights.length`).
    * The fold adds per-token contributions in document token order — a
    * fixed, engine-replayable order (SQL: `list_reduce` over the token
    * list) — and the result rounds to 6 dp. */
  def linearScoreWithWeights(c: Column, weights: Array[Double],
      salt: String = "qclf", bias: Double = 0.0): Column = {
    require(weights.nonEmpty, "need at least one weight")
    val warr = lit(weights)
    val raw = aggregate(tokens(lower(c)), lit(0.0), (acc, t) =>
      acc + element_at(warr,
        (tokenHashMod(concat(lit(s"$salt:"), t)) % weights.length).cast("int") + 1))
    val nTok = tokenCount(c)
    val mean = when(nTok > 0, raw / nTok.cast("double")).otherwise(lit(0.0))
    round(lit(1.0) / (lit(1.0) + exp(-(lit(bias) + mean))), 6)
  }

  /** Fraction of repeated whitespace tokens: `1 - distinct/total` (0 for
    * empty text) — the classic within-document repetition quality signal. */
  def dupTokenRatio(c: Column): Column = {
    val t = tokens(c)
    when(size(t) > 0,
      round(lit(1.0) - size(array_distinct(t)).cast("double") / size(t), 6))
      .otherwise(lit(0.0))
  }

  /** Word bigrams ("a b") of the whitespace tokens; empty below 2 tokens. */
  def wordBigrams(c: Column): Column = {
    val t = tokens(c)
    when(size(t) >= 2,
      transform(sequence(lit(1), size(t) - 1),
        i => concat(element_at(t, i), lit(" "), element_at(t, i + 1))))
      .otherwise(array().cast("array<string>"))
  }

  /** Fraction of repeated word bigrams (boilerplate detector — repeated
    * phrases score high where repeated single words may not). */
  def dupBigramRatio(c: Column): Column = {
    val b = wordBigrams(c)
    when(size(b) > 0,
      round(lit(1.0) - size(array_distinct(b)).cast("double") / size(b), 6))
      .otherwise(lit(0.0))
  }

  /** Rolling polynomial fingerprint over token hashes:
    * fp = fold(0, (acc, h) -> (acc*31 + h) mod HashMod). Matches DuckDB's
    * `list_reduce` over the same pre-modded token hashes. */
  def fingerprint(c: Column): Column =
    aggregate(transform(tokens(c), tokenHashMod(_)), lit(0L),
      (acc, x) => pmod(acc * 31L + x, lit(HashMod)))

  /** Word n-grams ("a b c") of the whitespace tokens, deduplicated; empty
    * below n tokens. The unit of benchmark decontamination
    * ([[Dedup.benchmarkContamination]]): token n-grams (not char shingles)
    * are the standard overlap unit for eval-set contamination checks. */
  def tokenNgrams(c: Column, n: Int): Column = {
    require(n >= 1, "tokenNgrams needs n >= 1")
    val t = tokens(c)
    when(size(t) >= n,
      array_distinct(transform(sequence(lit(0), size(t) - n),
        i => concat_ws(" ", slice(t, i + 1, lit(n))))))
      .otherwise(array().cast("array<string>"))
  }

  /** Deterministic PII scrubbing: emails then phone-like digit runs replaced
    * by placeholder tags. The patterns avoid lookaround so the SAME regex
    * runs identically under Java regex (Spark) and RE2 (DuckDB/Go) — the
    * oracle replays the scrub verbatim. This is the pattern-based tier of a
    * PII pipeline (cheap, runs in the scan); ML-based NER redaction would
    * slot in behind the same column contract. */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhonePattern = "\\+?[0-9][0-9 ()-]{6,}[0-9]"

  def redactPii(c: Column): Column =
    regexp_replace(
      regexp_replace(c, EmailPattern, "<EMAIL>"),
      PhonePattern, "<PHONE>")

  /** One-pass imperative n-gram explode shared by the corpus-stats and
    * decontamination fast paths: per document, one output row per DISTINCT
    * whitespace-token n-gram — (id, 60-bit md5 hash, n-gram string).
    * Tokenization, " "-joining, and per-doc dedup are bit-identical to the
    * Column path `explode(tokenNgrams(...))` + [[tokenHash]] (pinned by
    * TextDedupSpec): the Column path pays interpreted higher-order-function
    * evaluation with `tokens` re-inlined at every reference (O(tokens²) per
    * doc — measured ~4.5 s for 5 k docs at sf0.1 vs sub-second here). Still
    * a narrow, partition-parallel flatMap: no shuffle, no driver data. */
  def tokenNgramHashes(df: org.apache.spark.sql.DataFrame, idCol: Column,
      textCol: Column, n: Int): org.apache.spark.sql.DataFrame = {
    require(n >= 1, "tokenNgramHashes needs n >= 1")
    import org.apache.spark.sql.Encoders
    val in = df.select(idCol.cast("long"), textCol.cast("string"))
      .as(Encoders.tuple(Encoders.scalaLong, Encoders.STRING))
    in.mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("MD5")
      it.flatMap { case (id, text) =>
        // NULL text = no tokens (the Column path's when(...) yields [])
        val tk = (if (text == null) "" else text).split("\\s+").filter(_.nonEmpty)
        if (tk.length < n) Iterator.empty
        else {
          val seen = new java.util.HashSet[String]()
          (0 to tk.length - n).iterator.flatMap { i =>
            val sb = new java.lang.StringBuilder(tk(i))
            var j = i + 1
            while (j < i + n) { sb.append(' ').append(tk(j)); j += 1 }
            val ng = sb.toString
            if (seen.add(ng)) Iterator.single((id, md5H60(md, ng), ng))
            else Iterator.empty
          }
        }
      }
    }(Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong, Encoders.STRING))
      .toDF("id", "__h", "ngram")
  }

  /** [[tokenNgramHashes]] keyed by an arbitrary STRING column instead of a
    * long id (no hash column) — (key, ngram) with per-row dedup, for
    * incidence passes grouped by a categorical key (e.g. corpus source).
    * Bit-identical to `select(key, explode(tokenNgrams(text, n)))` (pinned
    * by TextDedupSpec) for the same reason as its sibling: the Column HOF
    * path re-inlines `tokens` at every reference — O(tokens²) interpreted
    * per doc, measured 2.8 s vs sub-second for 5 k docs at sf0.1. Same
    * scale shape: narrow partition-parallel flatMap, no shuffle. */
  def tokenNgramsByKey(df: org.apache.spark.sql.DataFrame, keyCol: Column,
      textCol: Column, n: Int): org.apache.spark.sql.DataFrame = {
    require(n >= 1, "tokenNgramsByKey needs n >= 1")
    import org.apache.spark.sql.Encoders
    val in = df.select(keyCol.cast("string"), textCol.cast("string"))
      .as(Encoders.tuple(Encoders.STRING, Encoders.STRING))
    in.mapPartitions { it =>
      it.flatMap { case (key, text) =>
        val tk = (if (text == null) "" else text).split("\\s+").filter(_.nonEmpty)
        if (tk.length < n) Iterator.empty
        else {
          val seen = new java.util.HashSet[String]()
          (0 to tk.length - n).iterator.flatMap { i =>
            val sb = new java.lang.StringBuilder(tk(i))
            var j = i + 1
            while (j < i + n) { sb.append(' ').append(tk(j)); j += 1 }
            val ng = sb.toString
            if (seen.add(ng)) Iterator.single((key, ng)) else Iterator.empty
          }
        }
      }
    }(Encoders.tuple(Encoders.STRING, Encoders.STRING)).toDF("key", "ngram")
  }

  /** Corpus-level top-k token n-grams by document frequency (each doc
    * counts an n-gram once — the explode is already distinct-per-doc).
    * The classic corpus-stats pass behind boilerplate detection and
    * stopword-list induction. Plan shape at 100 TB: the imperative
    * [[tokenNgramHashes]] explode fuses into the scan; the count is a
    * map-side-combining hash aggregate KEYED ON THE 64-BIT HASH — the
    * shuffle carries (hash, partial-count, one exemplar string) per distinct
    * n-gram per partition, never the raw n-gram stream; and the top-k is
    * Spark's TakeOrderedAndProject — per-partition heaps + a driver merge of
    * k rows per partition, never a global sort. The exemplar string rides
    * along via `max` (all strings under one hash are equal absent md5
    * collision; the oracle groups by the same hash so even a collision
    * agrees). Ties break lexicographically so the result is deterministic
    * and oracle-replayable. */
  def topNgrams(df: org.apache.spark.sql.DataFrame, textCol: String,
      n: Int, k: Int): org.apache.spark.sql.DataFrame =
    tokenNgramHashes(df, lit(0L), col(textCol), n)
      .groupBy("__h")
      .agg(max(col("ngram")).as("ngram"), count(lit(1)).as("doc_freq"))
      .orderBy(col("doc_freq").desc, col("ngram"))
      .limit(k)
      .select("ngram", "doc_freq")

  /** Per-document unigram surprisal — the cheap stand-in for LM-perplexity
    * quality filtering (CCNet-style): mean over the doc's tokens of
    * `ln(N / n_t)` where `n_t` is the token's corpus count and `N` the
    * corpus token total. Low = stereotyped/boilerplate text, high = rare
    * vocabulary (or noise); pipelines keep the middle band.
    *
    * Distributed shape at 100 TB: explode fuses into the scan; per-(doc,
    * term) counts and per-term corpus counts are map-side-combining
    * aggregates; ONE term-keyed equi-join (AQE-splittable stopword skew);
    * the single-row corpus total broadcasts. No driver materialization.
    *
    * Float determinism: the per-doc sum folds over the terms in SORTED term
    * order from an explicit 0.0 seed, so the floating-point addition order
    * is identical in every engine and run — DuckDB replays it with
    * `list(x ORDER BY term)` + a 0.0-seeded `list_reduce`, making the
    * result bit-exact, not just approximately equal. Output: one row per
    * doc with >= 1 token: (id, n_tok, surprisal). */
  def unigramSurprisal(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String): org.apache.spark.sql.DataFrame = {
    val toks = df.select(col(idCol).as("id"),
      explode(tokens(lower(col(textCol)))).as("term"))
    val perDoc = toks.groupBy("id", "term").agg(count(lit(1)).as("c"))
    val corpus = toks.groupBy("term").agg(count(lit(1)).as("n"))
    val total = toks.agg(count(lit(1)).cast("double").as("__N"))
    perDoc.join(corpus, "term")
      .crossJoin(broadcast(total))
      .groupBy("id")
      .agg(sum("c").as("n_tok"), first("__N").as("__N"),
        sort_array(collect_list(struct(col("term"), col("c"), col("n")))).as("__xs"))
      .select(col("id"), col("n_tok"),
        (aggregate(
          transform(col("__xs"),
            x => x.getField("c").cast("double") * log(col("__N") / x.getField("n"))),
          lit(0.0), (acc, v) => acc + v) / col("n_tok")).as("surprisal"))
  }

  /** Cross-corpus unigram surprisal — the CCNet-style quality filter in
    * its actual production shape: a unigram LM trained on a REFERENCE
    * corpus (trusted text) scores a TARGET corpus (the crawl). Per target
    * doc, the mean over token occurrences of
    * `ln((N + V + 1) / (n_t + 1))` — Laplace add-one with one extra vocab
    * slot, so reference-unseen terms score the finite ceiling
    * `ln(N + V + 1)` instead of ∞ (N = reference token total, V =
    * reference vocab size, n_t = the term's reference count). Low = reads
    * like the reference, high = off-distribution; `oov` (target
    * occurrences of reference-unseen terms) rides along as the companion
    * filter signal. [[unigramSurprisal]] is the self-scored special case
    * (reference = target, no smoothing).
    *
    * Scale shape: reference documents never shuffle (term counts are one
    * map-side-combining aggregate; the (N, V) totals aggregate the
    * ALREADY-REDUCED frequency table); scoring is ONE term-keyed
    * equi-join (AQE-splittable stopword skew) plus a single-row
    * broadcast. Float determinism: per-term values round 6 dp BEFORE the
    * sorted 0.0-seeded fold (the [[bigramSurprisal]] sub-ulp ln guard),
    * so the mean is engine-bit-identical. Output: one row per target doc
    * with >= 1 token: (id, n_tok, oov, surprisal). */
  def crossSurprisal(reference: org.apache.spark.sql.DataFrame,
      target: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String): org.apache.spark.sql.DataFrame = {
    val freq = reference
      .select(explode(tokens(lower(col(textCol)))).as("term"))
      .groupBy("term").agg(count(lit(1)).as("n"))
    val stats = freq.agg(sum("n").cast("double").as("__N"),
      count(lit(1)).cast("double").as("__V"))
    val perDoc = target
      .select(col(idCol).as("id"),
        explode(tokens(lower(col(textCol)))).as("term"))
      .groupBy("id", "term").agg(count(lit(1)).as("c"))
    perDoc.join(freq, Seq("term"), "left")
      .crossJoin(broadcast(stats))
      .groupBy("id")
      .agg(sum("c").as("n_tok"),
        sum(when(col("n").isNull, col("c")).otherwise(0L)).as("oov"),
        sort_array(collect_list(struct(col("term"),
          round(col("c").cast("double") *
            log((col("__N") + col("__V") + 1.0) /
              (coalesce(col("n"), lit(0L)).cast("double") + 1.0)), 6)
            .as("__v")))).as("__xs"))
      .select(col("id"), col("n_tok"), col("oov"),
        (aggregate(transform(col("__xs"), _.getField("__v")),
          lit(0.0), (acc, v) => acc + v) / col("n_tok")).as("surprisal"))
  }

  /** n-gram containment of `a` IN `b`: |shingles(a) ∩ shingles(b)| /
    * |shingles(a)| — the asymmetric near-dup measure (Broder's containment,
    * SEQUENCES '97) that Jaccard misses when one document embeds another
    * much larger one (quote inclusion, boilerplate wrapping): containment
    * stays 1.0 while Jaccard goes to |a|/|b|. NULL/short-text `a` (no
    * shingles) yields NULL via the 0/0 division. */
  def ngramContainment(a: Column, b: Column, n: Int): Column = {
    val sa = shingles(a, n)
    val sb = shingles(b, n)
    size(array_intersect(sa, sb)).cast("double") /
      nullif(size(sa).cast("double"), lit(0.0))
  }

  /** Per-document BIGRAM conditional surprisal — one Markov order up from
    * [[unigramSurprisal]] (the CCNet-style LM-quality proxy): mean over the
    * doc's bigram occurrences of `ln(c(w1·) / c(w1 w2))`, the negative log
    * of the corpus MLE `P(w2 | w1)`. `c(w1·)` counts w1 as a bigram
    * CONTEXT (bigrams starting with w1), so probabilities per context sum
    * to 1 exactly. Low = predictable/boilerplate text under the corpus
    * bigram LM, high = rare transitions.
    *
    * Distributed shape at 100 TB: the bigram explode fuses into the scan;
    * per-(doc, bigram) and corpus-bigram counts are map-side-combining
    * aggregates; context counts derive from the ALREADY-AGGREGATED bigram
    * counts (distinct-bigram-sized, not occurrence-sized); two term-keyed
    * equi-joins (AQE-splittable stopword skew). No driver materialization.
    *
    * Float determinism: as in [[unigramSurprisal]] the per-doc sum folds
    * over bigrams in SORTED order from an explicit 0.0 seed — but one more
    * guard is needed here: `cn/n` is very often an exact SMALL INTEGER
    * (a context seen k times with one bigram once), and JVM `StrictMath
    * .log` vs libm `ln` differ by 1 ulp on such inputs (measured:
    * ln(3.0) = ...96 vs ...98). Each term is therefore rounded 6 dp
    * BEFORE the fold, collapsing sub-ulp engine differences; the folded
    * doubles are then bit-identical and so is the mean. Output: one row
    * per doc with >= 2 tokens: (id, n_big, surprisal). */
  def bigramSurprisal(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String): org.apache.spark.sql.DataFrame = {
    val tk = tokens(lower(col(textCol)))
    val bgs = df.select(col(idCol).as("id"), tk.as("__tk"))
      .select(col("id"), explode(
        when(size(col("__tk")) >= 2,
          transform(sequence(lit(1), size(col("__tk")) - 1),
            i => concat(element_at(col("__tk"), i), lit(" "),
              element_at(col("__tk"), i + 1))))
          .otherwise(array().cast("array<string>"))).as("bg"))
    val perDoc = bgs.groupBy("id", "bg").agg(count(lit(1)).as("c"))
    val corpus = bgs.groupBy("bg").agg(count(lit(1)).as("n"))
    val ctx = corpus.groupBy(substring_index(col("bg"), " ", 1).as("__ctx"))
      .agg(sum("n").as("cn"))
    perDoc.join(corpus, "bg")
      .join(ctx, substring_index(col("bg"), " ", 1) === col("__ctx"))
      .groupBy("id")
      .agg(sum("c").as("n_big"),
        sort_array(collect_list(
          struct(col("bg"), col("c"), col("n"), col("cn")))).as("__xs"))
      .select(col("id"), col("n_big"),
        (aggregate(
          transform(col("__xs"),
            x => round(x.getField("c").cast("double") *
              log(x.getField("cn").cast("double") / x.getField("n")), 6)),
          lit(0.0), (acc, v) => acc + v) / col("n_big")).as("surprisal"))
  }

  /** Per-document character-level Shannon entropy (nats) — the cheap
    * gibberish/encoding-noise detector: low entropy flags repeated-char
    * padding and boilerplate, abnormally high entropy flags base64 blobs
    * and binary-in-text. `H = -Σ p_ch · ln p_ch` over the doc's character
    * distribution.
    *
    * Distributed shape: the per-character explode fuses into the scan and
    * collapses in a map-side-combining (id, char) count aggregate — the
    * shuffle carries distinct (doc, char) pairs (≤ alphabet size per doc),
    * never the character stream. Per-doc terms are rounded 6 dp and folded
    * in sorted character order from a 0.0 seed (the engine-stability rule
    * of [[bigramSurprisal]]: p is an exact small rational, where JVM
    * StrictMath.log and libm ln can differ by 1 ulp). The 0.0 seed also
    * normalizes the `-0.0` a single-character doc's `-(1·ln 1)` term would
    * otherwise leave. Output: (id, n_chars, entropy); empty/NULL docs are
    * omitted. */
  def charEntropy(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String): org.apache.spark.sql.DataFrame = {
    val cs = df.select(col(idCol).as("id"),
      explode(when(length(col(textCol)) >= 1,
        transform(sequence(lit(1), length(col(textCol))),
          i => col(textCol).substr(i, lit(1))))
        .otherwise(array().cast("array<string>"))).as("ch"))
    cs.groupBy("id", "ch").agg(count(lit(1)).as("c"))
      .groupBy("id")
      .agg(sum("c").as("n_chars"),
        sort_array(collect_list(struct(col("ch"), col("c")))).as("__xs"))
      .select(col("id"), col("n_chars"),
        (aggregate(
          transform(col("__xs"),
            x => round(-(x.getField("c") / col("n_chars")) *
              log(x.getField("c") / col("n_chars")), 6)),
          lit(0.0), (acc, v) => acc + v)).as("entropy"))
  }

  /** One-pass imperative fast path for [[charEntropy]], bit-identical by
    * construction (pinned by DedupParitySpec): per document the
    * code-point counts build in one HashMap, the per-char terms round
    * 6 dp and fold from 0.0 in ascending code-point order — exactly the
    * `sort_array(struct(ch, c))` order of the Column path (single
    * code-point strings sort by code point under UTF8String's binary
    * ordering). The Column path explodes ONE ROW PER CHARACTER through a
    * (doc, char) shuffle — measured 2.3 s at sf0.1 vs ~0.3 s here;
    * empty/NULL docs are omitted like the explode drops them. */
  def charEntropyFast(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.Encoders
    def round6(x: Double): Double =
      java.math.BigDecimal.valueOf(x).setScale(6, java.math.RoundingMode.HALF_UP)
        .doubleValue()
    val in = df.select(col(idCol).cast("long"), col(textCol).cast("string"))
      .as(Encoders.tuple(Encoders.scalaLong, Encoders.STRING))
    in.flatMap { case (id, text) =>
      if (text == null || text.isEmpty) None
      else {
        val counts = new java.util.TreeMap[Integer, Long]()
        var i = 0
        var n = 0L
        while (i < text.length) {
          val cp = text.codePointAt(i)
          counts.merge(cp, 1L, (a, b) => a + b)
          i += Character.charCount(cp)
          n += 1L
        }
        var acc = 0.0
        val it = counts.values().iterator()
        while (it.hasNext) {
          val c = it.next()
          val p = c.toDouble / n
          acc += round6(-p * math.log(p))
        }
        Some((id, n, acc))
      }
    }(Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong, Encoders.scalaDouble))
      .toDF("id", "n_chars", "entropy")
  }

  /** One-pass imperative fast path for BOTH repetition ratios. Bit-identical
    * to `dupTokenRatio`/`dupBigramRatio` (pinned by DedupParitySpec): the
    * Column path re-evaluates the interpreted `tokens` filter at every
    * reference (3x in each ratio, and the bigram transform again references
    * tokens per element), measured 17 s for 5 k docs at sf0.1 vs ~0.3 s
    * here. Output: (id, dup_tok, dup_bigram). */
  def repetitionFast(df: org.apache.spark.sql.DataFrame,
      textCol: String, idCol: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.Encoders
    def round6(x: Double): Double =
      java.math.BigDecimal.valueOf(x).setScale(6, java.math.RoundingMode.HALF_UP)
        .doubleValue()
    val in = df.select(col(idCol).cast("long"), col(textCol).cast("string"))
      .as(Encoders.tuple(Encoders.scalaLong, Encoders.STRING))
    in.map { case (id, text) =>
      // NULL text = no tokens (the Column path's when(...) yields 0.0/0.0)
      val tk = (if (text == null) "" else text).split("\\s+").filter(_.nonEmpty)
      val dupTok =
        if (tk.length > 0) round6(1.0 - tk.distinct.length.toDouble / tk.length)
        else 0.0
      val nb = tk.length - 1
      val dupBig =
        if (nb > 0) {
          val seen = new java.util.HashSet[String]()
          var i = 0
          while (i < nb) { seen.add(tk(i) + " " + tk(i + 1)); i += 1 }
          round6(1.0 - seen.size.toDouble / nb)
        } else 0.0
      (id, dupTok, dupBig)
    }(Encoders.tuple(Encoders.scalaLong, Encoders.scalaDouble, Encoders.scalaDouble))
      .toDF("id", "dup_tok", "dup_bigram")
  }

  /** Gopher-style rule-based quality filter (Rae et al., "Scaling Language
    * Models: Methods, Analysis & Insights from Training Gopher", 2021,
    * §A1.1) — the standard pre-model document filter of large-scale text
    * pipelines. Seven rules over per-document surface statistics:
    *
    *   - `f_word_count`:  50 <= word count <= 100000
    *   - `f_mean_len`:    3 <= mean word length <= 10
    *   - `f_symbol`:      (# + ellipsis occurrences) / words <= 0.1
    *   - `f_bullet`:      fraction of lines starting with a bullet <= 0.9
    *   - `f_ellipsis`:    fraction of lines ending in "..." <= 0.3
    *   - `f_alpha`:       fraction of words containing a letter >= 0.8
    *   - `f_stop`:        >= 2 distinct common-stopword hits
    *
    * Every metric is a ratio of exact integer counts — a single IEEE
    * division, bit-identical in any engine and addition order — rounded
    * 6 dp before the threshold compare so no boundary row can flip.
    * Zero shuffle: one codegen'd projection fused into the scan.
    * Output: (id, n_words, mean_word_len, symbol_ratio, bullet_ratio,
    * ellipsis_ratio, alpha_ratio, n_stop, the seven flags, pass). */
  def gopherFlags(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String): org.apache.spark.sql.DataFrame = {
    val t = col(textCol)
    val toks = tokens(t)
    val nWords = size(toks).cast("long")
    val sumLen = coalesce(
      aggregate(toks, lit(0L), (acc, x) => acc + length(x)), lit(0L))
    val meanLen = round(when(nWords > 0,
      sumLen.cast("double") / nWords).otherwise(lit(0.0)), 6)
    val nHash = size(split(t, "#", -1)) - 1
    val nEllip = size(regexp_extract_all(t, lit("\\.\\.\\."), lit(0)))
    val symbolRatio = round(when(nWords > 0,
      (nHash + nEllip).cast("double") / nWords).otherwise(lit(0.0)), 6)
    val lines = filter(split(t, "\n", -1), l => trim(l) =!= lit(""))
    val nLines = size(lines).cast("long")
    val nBullet = size(filter(lines,
      l => trim(l).rlike("^[-*•‣▪]")))
    val nEllipLine = size(filter(lines, l => trim(l).rlike("\\.\\.\\.$")))
    val bulletRatio = round(when(nLines > 0,
      nBullet.cast("double") / nLines).otherwise(lit(0.0)), 6)
    val ellipsisRatio = round(when(nLines > 0,
      nEllipLine.cast("double") / nLines).otherwise(lit(0.0)), 6)
    val nAlpha = size(filter(toks, w => w.rlike("[A-Za-z]")))
    val alphaRatio = round(when(nWords > 0,
      nAlpha.cast("double") / nWords).otherwise(lit(0.0)), 6)
    val nStop = size(array_intersect(tokens(lower(t)),
      array(LangStopwords.toMap.apply("en").map(lit): _*)))
    df.select(col(idCol).as("id"),
        nWords.as("n_words"), meanLen.as("mean_word_len"),
        symbolRatio.as("symbol_ratio"), bulletRatio.as("bullet_ratio"),
        ellipsisRatio.as("ellipsis_ratio"), alphaRatio.as("alpha_ratio"),
        nStop.cast("long").as("n_stop"))
      .withColumn("f_word_count",
        col("n_words") >= 50L && col("n_words") <= 100000L)
      .withColumn("f_mean_len",
        col("mean_word_len") >= 3.0 && col("mean_word_len") <= 10.0)
      .withColumn("f_symbol", col("symbol_ratio") <= 0.1)
      .withColumn("f_bullet", col("bullet_ratio") <= 0.9)
      .withColumn("f_ellipsis", col("ellipsis_ratio") <= 0.3)
      .withColumn("f_alpha", col("alpha_ratio") >= 0.8)
      .withColumn("f_stop", col("n_stop") >= 2L)
      .withColumn("pass",
        col("f_word_count") && col("f_mean_len") && col("f_symbol") &&
          col("f_bullet") && col("f_ellipsis") && col("f_alpha") &&
          col("f_stop"))
  }

  /** Per-group unigram KL divergence from the corpus:
    * KL(group ‖ corpus) = Σ_t p_t·ln(p_t/q_t) with p the group's unigram
    * distribution and q the corpus's — the standard corpus-drift /
    * source-divergence audit of a pretraining mix ("which source looks
    * least like the blend?"). Counts are exact longs (corpus counts
    * DERIVE from the per-group aggregate — one scan total); each term
    * does its divisions and one `ln` in double, rounds 6 dp, and the
    * rounded terms sum as DECIMAL(18,6) — ORDER-EXACT in any engine and
    * partitioning (the decimal cast of an already-6dp-rounded double is
    * exact, so no sorted fold and no per-group array is needed — this is
    * the scalable form of the q59/q94 fold discipline). The 6 dp
    * rounding also absorbs the cross-engine 1-ulp `ln` divergence.
    * Output: (group, n_terms, kl), kl as the exact decimal cast to
    * double. */
  def unigramKl(df: org.apache.spark.sql.DataFrame, groupCol: String,
      textCol: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val toks = df.select(col(groupCol).as("__g"),
      explode(tokens(col(textCol))).as("__t"))
    val st = toks.groupBy("__g", "__t").agg(count(lit(1)).as("__cst"))
    val ct = st.groupBy("__t").agg(sum("__cst").as("__ct"))
    val ns = st.groupBy("__g").agg(sum("__cst").as("__ns"))
    val n = ct.agg(sum("__ct").as("__n"))
    val p = col("__cst").cast("double") / col("__ns")
    val q = col("__ct").cast("double") / col("__n")
    val term = round(p * log(p / q), 6)
    st.join(ct, "__t")
      .join(broadcast(ns), "__g")
      .crossJoin(broadcast(n))
      .withColumn("__term", term.cast(DecimalType(18, 6)))
      .groupBy(col("__g").as(groupCol))
      .agg(count(lit(1)).as("n_terms"),
        sum("__term").cast("double").as("kl"))
  }

  /** Tokenizer fertility per language: BPE-ish subword tokens emitted per
    * whitespace word — the standard "how expensive is this language for
    * my tokenizer" audit (fertility ~1 for English-like text, >2 for
    * scripts the vocab underserves). Per-language totals are exact
    * integer map-side-combining sums; the single fertility division is
    * one IEEE op on the agreed integers, rounded 6 dp. One aggregate,
    * one scan. */
  def tokenizerFertility(df: org.apache.spark.sql.DataFrame,
      langCol: String, textCol: String): org.apache.spark.sql.DataFrame =
    df.select(col(langCol).as("lang"),
        tokenCount(col(textCol)).cast("long").as("__w"),
        bpeTokenCount(col(textCol)).cast("long").as("__b"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum("__w").as("tot_words"), sum("__b").as("tot_tokens"))
      .select(col("lang"), col("n_docs"), col("tot_words"), col("tot_tokens"),
        round(when(col("tot_words") > 0,
          col("tot_tokens").cast("double") / col("tot_words"))
          .otherwise(lit(0.0)), 6).as("fertility"))

  /** One BPE merge-candidate counting step — the inner loop of tokenizer
    * training (Sennrich ACL '16): with every word split into characters plus
    * an end-of-word marker, count each adjacent symbol pair weighted by word
    * frequency and rank the top-k merge candidates. Two aggregates, both
    * map-side combining: corpus → word frequencies (vocab-bounded), then
    * pair occurrences EXPLODE FROM THE VOCAB, not from the corpus — a word
    * seen a million times contributes its pairs once, weighted by its count.
    * Words are the `[a-z0-9]+` runs of the lowercased text (ASCII by
    * construction, so character indexing agrees across engines); a pair
    * occurring twice in one word counts twice (position-enumerated, as the
    * real algorithm does). Ties rank by (count desc, pair_a, pair_b) —
    * total order, deterministic. Output: (pair_a, pair_b, cnt, rank),
    * rank <= k. */
  def bpePairStats(df: org.apache.spark.sql.DataFrame, textCol: String,
      k: Int): org.apache.spark.sql.DataFrame = {
    require(k >= 1, s"bpePairStats requires k >= 1, got $k")
    val vocab = df
      .select(explode(regexp_extract_all(lower(col(textCol)),
        lit("[a-z0-9]+"), lit(0))).as("__w"))
      .groupBy("__w").agg(count(lit(1)).as("__f"))
    val pairs = vocab
      .withColumn("__s", expr(
        "concat(transform(sequence(1, char_length(__w)), i -> substring(__w, i, 1)), array('</w>'))"))
      .select(col("__f"), explode(expr(
        """transform(sequence(1, size(__s) - 1),
          |  i -> struct(element_at(__s, i) AS pair_a, element_at(__s, i + 1) AS pair_b))"""
          .stripMargin)).as("__p"))
      .select(col("__p.pair_a"), col("__p.pair_b"), col("__f"))
      .groupBy("pair_a", "pair_b").agg(sum("__f").as("cnt"))
    // rank on the alphabet-bounded pair frame (≤ |alphabet|² rows at ANY
    // corpus size — a one-task window here is a constant, not a scale risk)
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("cnt").desc, col("pair_a"), col("pair_b"))
    pairs.withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
  }

  /** BPE tokenizer TRAINING — the full iterative merge loop whose round-0
    * pair count is [[bpePairStats]] (Sennrich et al., ACL '16): each round
    * finds the corpus-wide most frequent adjacent symbol pair (total-order
    * ties: cnt desc, then the pair lexicographically) and rewrites every
    * greedy-left occurrence corpus-wide; `nMerges` rounds produce the
    * tokenizer's merge list. Words are the `[a-z0-9]+` runs of the
    * lowercased text, symbols start as characters + the `</w>` end mark —
    * the [[bpePairStats]] representation.
    *
    * Scale shape — the classic trick: the corpus reduces ONCE to the
    * distinct-word frequency table (one map-side-combining aggregate), and
    * every round runs on the VOCAB, never the corpus. Per round: a pair
    * explode over vocab symbols, one map-side-combining count, a top-1
    * TakeOrdered (no global sort), and a codegen'd `aggregate`-HOF fold
    * rewriting the symbol strings with the chosen pair as a LITERAL — so,
    * like [[graft.functions.Similarity.kmeansFit]], the loop state
    * visible to Catalyst is constant-size and the (tiny) vocab frame
    * localCheckpoints each round for constant lineage.
    *
    * Merge semantics is the reference greedy-left fold — `[a a a]` under
    * (a, a) becomes `[aa, a]`, never `[a, aa]` — implemented as an
    * (out, pend) accumulator fold; the SQL oracle replays the IDENTICAL
    * fold via an encoded-accumulator `list_reduce`, so every round is
    * engine-exact. Stops early if no adjacent pair remains. Output:
    * (round, lhs, rhs, merged, cnt), round starting at 1. */
  def bpeTrain(df: org.apache.spark.sql.DataFrame, textCol: String,
      nMerges: Int): org.apache.spark.sql.DataFrame = {
    require(nMerges >= 1, s"bpeTrain requires nMerges >= 1, got $nMerges")
    val sp = df.sparkSession
    // LAZY localCheckpoints throughout the training loop: each round's
    // top-pair job materializes (and caches) the pending rewrite as a side
    // effect, so a round costs ONE job instead of two — and the final
    // round's rewrite, which nothing ever reads, never executes at all.
    // Lineage still truncates at every checkpoint; results are identical.
    var vocab = df
      .select(explode(regexp_extract_all(lower(col(textCol)),
        lit("[a-z0-9]+"), lit(0))).as("__w"))
      .groupBy("__w").agg(count(lit(1)).as("__f"))
      .select(concat_ws(" ", expr(
        "concat(transform(sequence(1, char_length(__w)), i -> substring(__w, i, 1)), array('</w>'))"))
        .as("__s"), col("__f"))
      .localCheckpoint(false)
    val merges = scala.collection.mutable.ArrayBuffer
      .empty[(Long, String, String, String, Long)]
    var round = 0
    var dry = false
    while (round < nMerges && !dry) {
      val top = vocab
        .where(size(split(col("__s"), " ")) >= 2)
        .select(col("__f"), explode(expr(
          """transform(sequence(1, size(split(__s, ' ')) - 1),
            |  i -> struct(element_at(split(__s, ' '), i) AS s1,
            |              element_at(split(__s, ' '), i + 1) AS s2))"""
            .stripMargin)).as("__p"))
        .groupBy(col("__p.s1").as("s1"), col("__p.s2").as("s2"))
        .agg(sum("__f").as("cnt"))
        .orderBy(col("cnt").desc, col("s1"), col("s2"))
        .limit(1).collect()
      if (top.isEmpty) dry = true
      else {
        val (a, b, n) = (top(0).getString(0), top(0).getString(1),
          top(0).getLong(2))
        round += 1
        merges += ((round.toLong, a, b, a + b, n))
        // greedy-left rewrite: (out, pend) fold; "" is a safe none-marker
        // (symbols are never empty)
        def app(out: Column, x: Column) =
          when(out === "", x).otherwise(concat(out, lit(" "), x))
        val folded = aggregate(
          split(col("__s"), " "),
          struct(lit("").as("o"), lit("").as("p")),
          (acc, s) => {
            val o = acc.getField("o")
            val p = acc.getField("p")
            when(p === "", struct(o.as("o"), s.as("p")))
              .when(p === lit(a) && s === lit(b),
                struct(app(o, lit(a + b)).as("o"), lit("").as("p")))
              .otherwise(struct(app(o, p).as("o"), s.as("p")))
          },
          acc => when(acc.getField("p") === "", acc.getField("o"))
            .otherwise(app(acc.getField("o"), acc.getField("p"))))
        vocab = vocab.select(folded.as("__s"), col("__f"))
          .localCheckpoint(false)
      }
    }
    import sp.implicits._
    merges.toSeq.toDF("round", "lhs", "rhs", "merged", "cnt")
  }

  /** BPE ENCODING with a trained merge list — [[bpeTrain]]'s apply side:
    * each word ([a-z0-9]+ run of the lowercased text, chars + `</w>`)
    * is rewritten by every merge in LEARNED ORDER (the standard encoder:
    * merge r applies everywhere before merge r+1, each application the
    * same greedy-left fold as training). Returns one row per doc with
    * >= 1 word: (idCol, n_words, n_sym) — `n_sym` is the doc's total
    * symbol count under the tokenizer, the real-tokenizer sibling of the
    * whitespace [[tokenizerFertility]] denominator.
    *
    * Scale shape: the merge list is a driver-side Seq (k entries)
    * composed into ONE chain of k fold expressions — and the chain runs
    * once per DISTINCT word, not per occurrence (the same vocab trick as
    * training: fold the distinct-word frame, then one word-keyed
    * equi-join carries each word's symbol count back to its occurrences;
    * measured 4x cheaper than folding every occurrence at sf0.1).
    * Nothing per-row touches the merge table at runtime. */
  def bpeEncode(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, merges: Seq[(String, String)])
      : org.apache.spark.sql.DataFrame = {
    require(merges.nonEmpty, "bpeEncode requires at least one merge")
    val words = df.select(col(idCol),
      explode(regexp_extract_all(lower(col(textCol)),
        lit("[a-z0-9]+"), lit(0))).as("__w"))
    val vocabSyms = words.select("__w").distinct()
      .select(col("__w"),
        size(split(bpeFoldChain(merges), " ")).cast("long").as("__k"))
    words.join(vocabSyms, Seq("__w"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_words"),
        sum(col("__k")).cast("long").as("n_sym"))
  }

  /** [[bpeEncode]] emitting the actual TOKEN SEQUENCE — the tokenizer
    * consumer's surface, not just the fertility counts: one row per doc
    * with >= 1 word, (idCol, n_words, n_sym, tokens) where `tokens` is the
    * doc's space-joined symbol sequence under the trained merges (words in
    * document order; the `</w>` end-of-word markers keep the flat join
    * lossless). Serialized to ONE string per the suite-wide top-level-array
    * ban — a consumer splits on ' '.
    *
    * Same vocab trick as [[bpeEncode]]: the k-fold chain runs once per
    * DISTINCT word; occurrences carry only a word-keyed join. The only
    * addition is per-doc ordered reassembly (posexplode index → sort_array
    * over (pos, sym) structs), whose state is one document's tokens — the
    * same per-doc bound every text metric here already has. */
  def bpeEncodeSeq(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, merges: Seq[(String, String)])
      : org.apache.spark.sql.DataFrame = {
    require(merges.nonEmpty, "bpeEncodeSeq requires at least one merge")
    val words = df.select(col(idCol),
      posexplode(regexp_extract_all(lower(col(textCol)),
        lit("[a-z0-9]+"), lit(0))).as(Seq("__i", "__w")))
    val vocabSyms = words.select("__w").distinct()
      .select(col("__w"), bpeFoldChain(merges).as("__sym"))
    words.join(vocabSyms, Seq("__w"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_words"),
        sum(size(split(col("__sym"), " "))).cast("long").as("n_sym"),
        array_join(transform(
          sort_array(collect_list(struct(col("__i"), col("__sym")))),
          x => x.getField("__sym")), " ").as("tokens"))
  }

  /** The ID-ASSIGNED VOCABULARY of a trained BPE encoder over a corpus:
    * one row per distinct symbol the encoder emits on the corpus' words,
    * with dense token ids in lexicographic symbol order — the
    * deterministic assignment rule (no frequency ties to break), fully
    * SQL-replayable. `n_occ` counts corpus occurrences (per-word symbol
    * counts weighted by word frequency) — the fertility/compression
    * audit column. Output: (token_id, symbol, n_occ).
    *
    * Scale shape: the corpus reduces once to the distinct-word frequency
    * frame (the training vocab trick); symbols explode off the per-word
    * fold chain and aggregate map-side. The id window is a single-task
    * sort of a VOCAB-BOUNDED frame (base characters + surviving merges —
    * dozens to tens of thousands of rows at any corpus size), the one
    * place a global window is the right tool. */
  def bpeVocab(df: org.apache.spark.sql.DataFrame, textCol: String,
      merges: Seq[(String, String)]): org.apache.spark.sql.DataFrame = {
    require(merges.nonEmpty, "bpeVocab requires at least one merge")
    val words = df
      .select(explode(regexp_extract_all(lower(col(textCol)),
        lit("[a-z0-9]+"), lit(0))).as("__w"))
      .groupBy("__w").agg(count(lit(1)).as("__f"))
    val syms = words
      .select(col("__f"),
        explode(split(bpeFoldChain(merges), " ")).as("symbol"))
      .groupBy("symbol").agg(sum("__f").as("n_occ"))
    val w = org.apache.spark.sql.expressions.Window.orderBy("symbol")
    syms.select(row_number().over(w).cast("long").as("token_id"),
      col("symbol"), col("n_occ"))
  }

  /** [[bpeEncodeSeq]] emitting TOKEN IDS — the final surface a training
    * pipeline feeds the model: each doc's symbol sequence mapped through
    * the [[bpeVocab]] id assignment, comma-joined into one string (the
    * top-level-array ban; a consumer splits on ','). Pass a precomputed
    * `vocab` (token_id, symbol) for the production shape — encode a new
    * batch under a FROZEN tokenizer; by default the vocab derives from
    * `df` itself. A symbol absent from a frozen vocab drops (the
    * OOV-symbol policy of a fixed vocab; with the derived default every
    * symbol is present by construction). Output:
    * (idCol, n_sym, token_ids).
    *
    * Scale shape: the fold chain and the symbol→id join run once per
    * DISTINCT word (vocab broadcast onto the exploded per-word symbols);
    * occurrences carry only the word-keyed join plus the same per-doc
    * ordered reassembly as [[bpeEncodeSeq]]. */
  def bpeEncodeIds(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, merges: Seq[(String, String)],
      vocab: Option[org.apache.spark.sql.DataFrame] = None)
      : org.apache.spark.sql.DataFrame = {
    require(merges.nonEmpty, "bpeEncodeIds requires at least one merge")
    val voc = vocab.getOrElse(bpeVocab(df, textCol, merges))
      .select(col("symbol").as("__s"), col("token_id"))
    val words = df.select(col(idCol),
      posexplode(regexp_extract_all(lower(col(textCol)),
        lit("[a-z0-9]+"), lit(0))).as(Seq("__i", "__w")))
    val wsyms = words.select("__w").distinct()
      .select(col("__w"),
        posexplode(split(bpeFoldChain(merges), " ")).as(Seq("__j", "__s")))
    val wids = wsyms.join(broadcast(voc), Seq("__s"))
      .groupBy("__w")
      .agg(count(lit(1)).as("__k"),
        array_join(transform(
          sort_array(collect_list(struct(col("__j"), col("token_id")))),
          x => x.getField("token_id").cast("string")), ",").as("__ids"))
    words.join(wids, Seq("__w"))
      .groupBy(col(idCol))
      .agg(sum(col("__k")).cast("long").as("n_sym"),
        array_join(transform(
          sort_array(collect_list(struct(col("__i"), col("__ids")))),
          x => x.getField("__ids")), ",").as("token_ids"))
  }

  /** The composed greedy-left fold chain of a trained merge list, applied
    * to the char+`</w>` decomposition of word column `__w` — shared by
    * [[bpeEncode]] (counts) and [[bpeEncodeSeq]] (sequence). */
  private def bpeFoldChain(merges: Seq[(String, String)]): Column = {
    def app(out: Column, x: Column) =
      when(out === "", x).otherwise(concat(out, lit(" "), x))
    def fold(sym: Column, a: String, b: String): Column = aggregate(
      split(sym, " "),
      struct(lit("").as("o"), lit("").as("p")),
      (acc, s) => {
        val o = acc.getField("o")
        val p = acc.getField("p")
        when(p === "", struct(o.as("o"), s.as("p")))
          .when(p === lit(a) && s === lit(b),
            struct(app(o, lit(a + b)).as("o"), lit("").as("p")))
          .otherwise(struct(app(o, p).as("o"), s.as("p")))
      },
      acc => when(acc.getField("p") === "", acc.getField("o"))
        .otherwise(app(acc.getField("o"), acc.getField("p"))))
    val sym0 = concat_ws(" ", expr(
      "concat(transform(sequence(1, char_length(__w)), i -> substring(__w, i, 1)), array('</w>'))"))
    merges.foldLeft(sym0) { case (s, (a, b)) => fold(s, a, b) }
  }

  /** Unigram-LM (SentencePiece-family, Kudo ACL '18) VITERBI segmentation
    * of the distinct-word column `__w` under a fixed piece→score map —
    * the maximum-total-score split, scores being INTEGER-scaled log
    * probabilities (`round(ln(p) * 1e6)` longs), so the whole DP runs in
    * exact long arithmetic and replays bit-for-bit in SQL. Tie rule:
    * equal path scores prefer the longer final piece at each DP cell
    * (checked j descending), making the argmax total order explicit.
    * Forward pass accumulates (score, backpointer) per position in one
    * `aggregate` fold; the backward pass walks the backpointers in a
    * second fold. A word with NO valid path (a character outside the
    * vocab) segments to `[UNK]` — the whole-word bail, same contract as
    * [[wordpieceEncode]]. */
  private def viterbiSegment(scores: Map[String, Long],
      maxPieceLen: Int): Column = {
    // large-negative sentinel instead of Long.MinValue: candidates ADD
    // piece scores to it, and MinValue + negative would wrap positive
    val NegInf = -1000000000000000L
    val smap = typedLit(scores)
    val n = length(col("__w"))
    val fwd = aggregate(
      sequence(lit(1), n),
      array(struct(lit(0L).as("s"), lit(0).as("bp"))), // dp[0]: empty prefix
      (acc, i) => {
        // candidates as an array + array_max: struct comparison is
        // lexicographic (score, then length), which IS the tie rule —
        // and the tree stays linear in maxPieceLen, where a nested
        // when-chain fold duplicated the accumulator ~3^L times and the
        // resulting codegen dominated wall time (measured 13 s of fixed
        // planning/codegen per use at any SF)
        val cands = array((1 to maxPieceLen).map { j =>
          val prev = element_at(acc, greatest(i - j + 1, lit(1)).cast("int"))
          val piece = col("__w").substr(i - j + 1, lit(j))
          val sc = element_at(smap, piece)
          val valid = i - j >= 0 && sc.isNotNull &&
            prev.getField("s") > lit(NegInf)
          struct(
            when(valid, prev.getField("s") + coalesce(sc, lit(0L)))
              .otherwise(lit(NegInf)).as("s"),
            lit(j).as("bp"))
        }: _*)
        val best = array_max(cands)
        // all-invalid: array_max yields (NegInf, maxPieceLen) — bp gates
        // back to 0 so the cell reads as unreachable
        concat(acc, array(struct(best.getField("s").as("s"),
          when(best.getField("s") <= lit(NegInf), lit(0))
            .otherwise(best.getField("bp")).as("bp"))))
      },
      acc => acc)
    val bps = transform(fwd, x => x.getField("bp"))
    val unreachable =
      element_at(fwd, (n + 1).cast("int")).getField("s") <= lit(NegInf)
    val back = aggregate(
      sequence(lit(1), n), // each step consumes >= 1 char: n steps suffice
      struct(n.cast("int").as("pos"), lit("").as("o")),
      (acc, _) => {
        val pos = acc.getField("pos"); val o = acc.getField("o")
        val bp = element_at(bps, greatest(pos + 1, lit(1)))
        val piece = col("__w").substr(pos - bp + 1, bp)
        when(pos <= 0, acc).otherwise(struct((pos - bp).cast("int").as("pos"),
          when(o === "", piece).otherwise(concat(piece, lit(" "), o)).as("o")))
      },
      acc => acc.getField("o"))
    when(unreachable, lit("[UNK]")).otherwise(back)
  }

  /** Integer-scaled log-probability scores from piece counts:
    * `round(ln(c / total) * 1e6)` as a long, half away from zero — the
    * one float op of the unigram tokenizer, rounded once at a fixed
    * scale so both engines agree (the q94/q132 engine-stability rule). */
  private def unigramScores(counts: Map[String, Long]): Map[String, Long] = {
    val total = counts.values.sum.toDouble
    counts.map { case (p, c) =>
      p -> BigDecimal(math.log(c / total) * 1e6)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    }
  }

  /** Unigram-LM tokenizer TRAINING (Kudo ACL '18, deterministic
    * frequency-seeded variant): seed counts are all substring occurrences
    * of length 1..`maxPieceLen` over the distinct-word frame weighted by
    * word frequency — top `k` multi-char pieces by (count desc, piece)
    * plus every observed single character (so segmentation is total on
    * the training corpus); then `rounds` EM iterations, each Viterbi-
    * segmenting the distinct words under the current integer-scaled
    * scores (E) and recounting piece usage from the segmentations (M —
    * unused multi-char pieces leave the vocab; characters always stay,
    * count-floored at 1). Returns (token_id, piece, n_occ, score) — ids
    * dense in piece order, `n_occ` the final usage counts, `score` the
    * final `round(ln(p)·1e6)` longs [[unigramEncode]] consumes.
    *
    * Scale shape (the [[bpeTrain]] vocab trick): every round touches the
    * DISTINCT-WORD frame only — the corpus pays one word-count
    * aggregation total; the Viterbi fold is a codegen'd expression over
    * vocab literals (vocabularies are KB-scale by construction), and the
    * per-round piece recount collects a vocab-bounded frame. */
  def unigramTrain(df: org.apache.spark.sql.DataFrame, textCol: String,
      k: Int, maxPieceLen: Int = 4, rounds: Int = 1)
      : org.apache.spark.sql.DataFrame = {
    require(k >= 1, s"unigramTrain requires k >= 1, got $k")
    require(maxPieceLen >= 2, s"maxPieceLen must be >= 2, got $maxPieceLen")
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    val sp = df.sparkSession
    val words = df
      .select(explode(regexp_extract_all(lower(col(textCol)),
        lit("[a-z0-9]+"), lit(0))).as("__w"))
      .groupBy("__w").agg(count(lit(1)).as("__f"))
      .localCheckpoint(false) // lazy: the subs job materializes it; re-read once per EM round
    val subs = words.select(col("__f"),
        explode(expr(
          s"""flatten(transform(sequence(1, char_length(__w)), p ->
             |  transform(sequence(1, least($maxPieceLen, char_length(__w) - p + 1)), j ->
             |    substring(__w, p, j))))""".stripMargin)).as("piece"))
      .groupBy("piece").agg(sum("__f").as("c"))
      .localCheckpoint(false) // lazy: char-slice collect materializes; top-k slice re-reads
    val chars = subs.where(length(col("piece")) === 1)
      .collect().map(r => r.getString(0) -> r.getLong(1))
    val multi = subs.where(length(col("piece")) > 1)
      .orderBy(col("c").desc, col("piece")).limit(k)
      .collect().map(r => r.getString(0) -> r.getLong(1))
    val charSet = chars.map(_._1).toSet
    var counts = (chars ++ multi).toMap
    (1 to rounds).foreach { _ =>
      val segged = words
        .select(col("__f"),
          explode(split(viterbiSegment(unigramScores(counts), maxPieceLen),
            " ")).as("piece"))
        .groupBy("piece").agg(sum("__f").as("c"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      // chars always survive (count-floored); multi-char pieces live on
      // segmentation usage alone
      counts = segged.filter { case (p, _) => !charSet.contains(p) } ++
        charSet.map(ch => ch -> math.max(segged.getOrElse(ch, 0L), 1L))
    }
    val scores = unigramScores(counts)
    import sp.implicits._
    val voc = counts.toSeq.sortBy(_._1)
      .map { case (p, c) => (p, c, scores(p)) }
      .toDF("piece", "n_occ", "score")
    val w = org.apache.spark.sql.expressions.Window.orderBy("piece")
    voc.select(row_number().over(w).cast("long").as("token_id"),
      col("piece"), col("n_occ"), col("score"))
  }

  /** Unigram-LM ENCODE: Viterbi segmentation of every document under a
    * trained piece→score vocabulary ([[unigramTrain]]'s (piece, score)
    * pairs). Output per doc: (idCol, n_words, n_unk, n_pieces, pieces) —
    * the [[wordpieceEncode]] surface, segmentation by max total log
    * probability instead of greedy longest-match. The DP runs once per
    * DISTINCT word with the vocab as a map literal; occurrences pay one
    * word-keyed join plus the per-doc ordered reassembly. */
  def unigramEncode(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, scores: Map[String, Long], maxPieceLen: Int = 4)
      : org.apache.spark.sql.DataFrame = {
    require(scores.nonEmpty, "unigramEncode requires a non-empty vocab")
    require(maxPieceLen >= 1, s"maxPieceLen must be >= 1, got $maxPieceLen")
    require(scores.size <= 65536,
      s"literal-embed vocab regime is <= 65536 pieces, got ${scores.size}")
    val words = df.select(col(idCol),
      posexplode(regexp_extract_all(lower(col(textCol)),
        lit("[a-z0-9]+"), lit(0))).as(Seq("__i", "__w")))
    val wenc = words.select("__w").distinct()
      .select(col("__w"),
        viterbiSegment(scores, maxPieceLen).as("__p"))
      .select(col("__w"), col("__p"),
        (col("__p") === "[UNK]").as("__unk"),
        size(split(col("__p"), " ")).cast("long").as("__np"))
    words.join(wenc, Seq("__w"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_words"),
        sum(col("__unk").cast("long")).as("n_unk"),
        sum(col("__np")).as("n_pieces"),
        array_join(transform(
          sort_array(collect_list(struct(col("__i"), col("__p")))),
          x => x.getField("__p")), " ").as("pieces"))
  }

  /** WordPiece VOCABULARY selection — the companion tokenizer family to
    * BPE (Devlin et al., NAACL '19 use the greedy variant; vocab pieces
    * carry the `##` continuation prefix when they may only match inside a
    * word). Deterministic frequency heuristic in place of the
    * likelihood-ranked original (whose float scores are not
    * engine-replayable): every substring occurrence of length 2..
    * `maxPieceLen` inside every word occurrence counts toward its FORM
    * (plain at word start, `##`-prefixed elsewhere); the top `k` forms by
    * (count desc, piece asc) survive, and every observed single-character
    * form is always included so [[wordpieceEncode]] under this vocab is
    * total — no `[UNK]` can fire on the training corpus itself. Output:
    * (piece, n_occ), plus dense `token_id` in piece order.
    *
    * Scale shape: substrings explode off the DISTINCT-word frame weighted
    * by occurrence counts (the vocab trick — corpus length never inflates
    * the explode), aggregate map-side, and the id window sorts a
    * vocab-bounded frame only. */
  def wordpieceVocab(df: org.apache.spark.sql.DataFrame, textCol: String,
      k: Int, maxPieceLen: Int = 4): org.apache.spark.sql.DataFrame = {
    require(k >= 1, s"wordpieceVocab requires k >= 1, got $k")
    require(maxPieceLen >= 2, s"maxPieceLen must be >= 2, got $maxPieceLen")
    val words = df
      .select(explode(regexp_extract_all(lower(col(textCol)),
        lit("[a-z0-9]+"), lit(0))).as("__w"))
      .groupBy("__w").agg(count(lit(1)).as("__f"))
    // one row per (start, len) substring slot of each distinct word
    val subs = words.select(col("__f"),
        explode(expr(
          s"""flatten(transform(sequence(1, char_length(__w)), p ->
             |  transform(sequence(1, least($maxPieceLen, char_length(__w) - p + 1)), j ->
             |    CASE WHEN p = 1 THEN substring(__w, p, j)
             |         ELSE concat('##', substring(__w, p, j)) END)))""".stripMargin))
          .as("piece"))
      .groupBy("piece").agg(sum("__f").as("n_occ"))
    val isChar = length(regexp_replace(col("piece"), lit("^##"), lit(""))) === 1
    val chars = subs.where(isChar)
    val multi = subs.where(!isChar)
      .orderBy(col("n_occ").desc, col("piece")).limit(k)
    val voc = chars.unionByName(multi)
    val w = org.apache.spark.sql.expressions.Window.orderBy("piece")
    voc.select(row_number().over(w).cast("long").as("token_id"),
      col("piece"), col("n_occ"))
  }

  /** WordPiece ENCODE — greedy longest-match-first segmentation under a
    * fixed vocabulary (the BERT tokenizer's algorithm): at each position
    * the longest vocab piece (`##`-form when not at the word start, max
    * candidate length `maxPieceLen`) is taken; a position with NO match
    * collapses the whole word to `[UNK]` (the standard whole-word bail).
    * Pure integer/string folds — no float anywhere — so the segmentation
    * replays exactly in SQL. Output per doc:
    * (idCol, n_words, n_unk, n_pieces, pieces) with `pieces` the
    * space-joined piece stream in document order ([UNK] counts 1 piece).
    *
    * Scale shape ([[bpeEncode]]'s vocab trick): the greedy fold runs once
    * per DISTINCT word with the vocab embedded as an array literal
    * (vocabularies are KB–MB scale by construction); occurrences pay one
    * word-keyed join plus the per-doc ordered reassembly. */
  def wordpieceEncode(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, vocab: Seq[String], maxPieceLen: Int = 4)
      : org.apache.spark.sql.DataFrame = {
    require(vocab.nonEmpty, "wordpieceEncode requires a non-empty vocab")
    require(maxPieceLen >= 1, s"maxPieceLen must be >= 1, got $maxPieceLen")
    require(vocab.size <= 65536,
      s"literal-embed vocab regime is <= 65536 pieces, got ${vocab.size}")
    val vocabSet = vocab.distinct
    val n = length(col("__w"))
    // fold state: (o = emitted pieces, k = next unconsumed position,
    // u = whole-word [UNK] bail). Positions the last piece consumed are
    // skipped via k; candidates test longest-first so the first hit wins.
    // Membership tests use isin (optimizes to a hash-set InSet) instead of
    // array_contains over a literal array: these HOF lambdas evaluate
    // interpreted, where the literal-array scan is O(|vocab|) per candidate
    // and the hash set is O(1) — same string-equality semantics.
    val enc = aggregate(
      sequence(lit(1), n),
      struct(lit("").as("o"), lit(1).as("k"), lit(false).as("u")),
      (acc, i) => {
        val o = acc.getField("o"); val kk = acc.getField("k")
        val u = acc.getField("u")
        val matchLen = (maxPieceLen to 1 by -1).foldLeft(lit(0)) { (best, j) =>
          val piece = concat(when(i > 1, lit("##")).otherwise(lit("")),
            col("__w").substr(i, lit(j)))
          when(best > 0, best).otherwise(
            when(i + lit(j) - 1 <= n && piece.isin(vocabSet: _*), lit(j))
              .otherwise(lit(0)))
        }
        val taken = concat(when(i > 1, lit("##")).otherwise(lit("")),
          col("__w").substr(i, matchLen))
        when(u || i < kk, acc)
          .when(matchLen === 0,
            struct(lit("").as("o"), kk.as("k"), lit(true).as("u")))
          .otherwise(struct(
            when(o === "", taken).otherwise(concat(o, lit(" "), taken)).as("o"),
            (i + matchLen).as("k"), lit(false).as("u")))
      },
      acc => when(acc.getField("u"), lit("[UNK]")).otherwise(acc.getField("o")))
    val words = df.select(col(idCol),
      posexplode(regexp_extract_all(lower(col(textCol)),
        lit("[a-z0-9]+"), lit(0))).as(Seq("__i", "__w")))
    val wenc = words.select("__w").distinct()
      .select(col("__w"), enc.as("__p"))
      .select(col("__w"), col("__p"),
        (col("__p") === "[UNK]").as("__unk"),
        size(split(col("__p"), " ")).cast("long").as("__np"))
    words.join(wenc, Seq("__w"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_words"),
        sum(col("__unk").cast("long")).as("n_unk"),
        sum(col("__np")).as("n_pieces"),
        array_join(transform(
          sort_array(collect_list(struct(col("__i"), col("__p")))),
          x => x.getField("__p")), " ").as("pieces"))
  }
}
