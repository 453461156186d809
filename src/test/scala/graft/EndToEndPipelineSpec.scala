package graft

import org.apache.spark.sql.functions._
import graft.functions.{Dedup, Packing, Sampling, TextFunctions => TF}

/** The whole training-data pipeline, composed from the library's operators
  * on one deterministic fixture: quality filter → exact dedup → near-dup
  * clustering → benchmark decontamination → mixture reweighting →
  * per-language token budget → global shuffle → sequence packing. Every
  * stage's survivors are asserted exactly, and the full pipeline re-runs
  * to an identical result — the end-to-end reproducibility claim the
  * per-operator specs only make individually.
  */
class EndToEndPipelineSpec extends SparkSuite {
  import spark.implicits._

  private val vocab = Seq(
    "alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf",
    "hotel", "india", "juliet", "kilo", "lima", "mike", "november",
    "oscar", "papa", "quebec", "romeo", "sierra", "tango", "uniform",
    "victor", "whiskey", "xray", "yankee", "zulu")

  // interleaving id-specific tokens keeps unrelated docs far below any
  // near-dup threshold while the planted pairs stay above it
  private def baseText(i: Long): String =
    (0 until 10).map { j =>
      if (j % 2 == 0) vocab(((i * 3 + j) % vocab.length).toInt) else s"t${i}_$j"
    }.mkString(" ")

  test("filter -> dedup -> decontaminate -> mixture -> budget -> shuffle -> pack, end to end, twice") {
    val langs = Seq("en", "de", "zh")
    val base = (0L until 30L).map(i => (i, baseText(i), langs((i % 3).toInt)))
    val planted = Seq(
      (100L, baseText(0), "en"),                       // exact dup of 0
      (101L, baseText(1), "de"),                       // exact dup of 1
      (102L, baseText(2) + " tiny tail", "zh"),        // near dup of 2
      (103L, "filler words zebra quagga okapi more filler", "en"), // contaminated
      (104L, "x x x x x x x x", "en"),                 // repetition junk
      (105L, "ab", "de"))                              // too short
    val corpus = (base ++ planted).toDF("doc_id", "text", "lang")
    val evalSet = Seq((0L, "zebra quagga okapi gnu eland")).toDF("eval_id", "text")

    def runPipeline() = {
      // 1. quality: enough tokens, low within-doc repetition
      val filtered = corpus
        .where(TF.tokenCount(col("text")) >= 5 &&
          TF.dupTokenRatio(col("text")) < 0.5)
      // 2. exact dedup: keep each distinct text's min-id keeper
      val groups = Dedup.exactDupGroups(filtered, "text", "doc_id")
      val exact = filtered.join(groups.select(col("keeper")),
        filtered("doc_id") === col("keeper"), "left_semi")
      // 3. near-dup clustering: keep each component's representative
      val pairs = Dedup.nearDupPairs(exact, "text", "doc_id", threshold = 0.5)
        .select(col("id_a").as("a"), col("id_b").as("b"))
      val labels = Dedup.connectedComponents(pairs,
        exact.select(col("doc_id").as("id")))
      val reps = labels.where(col("id") === col("rep")).select(col("id"))
      val deduped = exact.join(reps, exact("doc_id") === reps("id"), "left_semi")
      // 4. decontamination: drop docs sharing a token 3-gram with the eval set
      val hits = Dedup.benchmarkContamination(deduped, evalSet, "text", "doc_id", n = 3)
      val clean = deduped.join(hits.select(col("id")),
        deduped("doc_id") === hits("id"), "left_anti")
      // 5. mixture: integer weight for en makes its repetition exact
      val mixed = Sampling.resampleByWeight(clean, "doc_id", "lang",
        Map("en" -> 2.0, "de" -> 1.0, "zh" -> 0.5))
      // 6. per-language token budget over the (doc, epoch) stream: en is
      //    capped tight (strict hash-order prefix), other langs unbounded
      val keyed = mixed.withColumn("key",
        concat_ws("#", col("doc_id"), col("epoch")))
        .withColumn("ntok", TF.tokenCount(col("text")).cast("long"))
      val budgeted = Sampling.capByBudgetPerStratum(keyed, "key", "ntok",
        "lang", Map("en" -> 120L), defaultBudget = Long.MaxValue)
      // 7. deterministic global shuffle of the surviving (doc, epoch) rows
      val shuffled = Sampling.globalShuffle(budgeted, "key")
      // 8. sequence packing by token budget
      val packed = Packing.packStream(shuffled, "key",
        TF.tokenCount(col("text")), capacity = 24L, nBuckets = 4)
      (filtered, exact, deduped, clean, mixed, budgeted, shuffled, packed)
    }

    val (filtered, exact, deduped, clean, mixed, budgeted, shuffled, packed) = runPipeline()

    // stage 1: junk gone, everything else intact
    val fIds = filtered.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(!fIds.contains(104L) && !fIds.contains(105L))
    assert(fIds.size == 34)
    // stage 2: exact dups lose to their min-id keeper
    val eIds = exact.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(!eIds.contains(100L) && !eIds.contains(101L))
    assert(eIds.contains(0L) && eIds.contains(1L) && eIds.size == 32)
    // stage 3: the near-dup pair collapses to min id 2
    val dIds = deduped.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(dIds.contains(2L) && !dIds.contains(102L) && dIds.size == 31)
    // stage 4: the contaminated doc is dropped, nothing else is
    val cIds = clean.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(cIds == dIds - 103L)
    assert(cIds.size == 30)
    // stage 5: every en doc exactly twice (epochs 0,1), de once, zh kept-or-
    // dropped at epoch 0 only
    val byDoc = mixed.groupBy("doc_id", "lang").agg(collect_set("epoch").as("es"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getSeq[Long](2).toSet))
    byDoc.foreach { case (id, lang, es) =>
      lang match {
        case "en" => assert(es == Set(0L, 1L), s"doc $id: $es")
        case "de" => assert(es == Set(0L), s"doc $id: $es")
        case "zh" => assert(es == Set(0L), s"doc $id: $es")
      }
    }
    // stage 6: the en stream is budget-capped to the strict hash-order
    // prefix (<= 120 tokens); other languages pass through untouched
    val enToks = budgeted.where(col("lang") === "en")
      .agg(sum("ntok")).head().getLong(0)
    assert(enToks <= 120L && enToks > 0L)
    assert(budgeted.where(col("lang") === "en").count() <
      mixed.where(col("lang") === "en").count(), "the en budget must bind")
    assert(budgeted.where(col("lang") =!= "en").count() ==
      mixed.where(col("lang") =!= "en").count())
    // stage 7: a contiguous permutation over the surviving rows, and the
    // PERMUTATION ITSELF equals the one-window row_number()-1 replay — the
    // 0-based contract the q66 oracle states (regression-locks the
    // bucket-offset prefix sum's 1-based/0-based adjustment)
    val n = budgeted.count()
    val idxs = shuffled.select("idx").collect().map(_.getLong(0)).sorted
    assert(idxs.toSeq == (0L until n))
    val hkey = TF.tokenHashMod(concat(lit("shuffle:"), col("key").cast("string")))
    val refIdx = budgeted
      .withColumn("h", hkey)
      .withColumn("ref_idx", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(col("h"), col("key")))
        .cast("long") - 1L)
      .select("key", "ref_idx").collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val gotIdx = shuffled.select("key", "idx").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(gotIdx == refIdx)
    // stage 8: pack budget respected per bucket
    val buckets = packed.groupBy("bucket")
      .agg(sum("n_tok").as("toks"), max("pack_last").as("last"))
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    buckets.foreach { case (toks, last) =>
      assert(toks <= (last + 1) * 24L, s"toks=$toks last=$last")
    }
    assert(packed.count() == n)

    // the whole pipeline is deterministic: a second run is row-identical
    val (_, _, _, _, _, _, shuffled2, packed2) = runPipeline()
    assert(shuffled.except(shuffled2).count() == 0 &&
      shuffled2.except(shuffled).count() == 0)
    assert(packed.except(packed2).count() == 0 &&
      packed2.except(packed).count() == 0)
  }
}
