package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import TextFunctions.tokens

/** Sequence packing and chunking for training-data pipelines: turning a
  * corpus of variable-length documents into fixed-token-budget training
  * sequences. Two standard formulations, both deterministic and pure
  * Column expressions so a SQL oracle can replay them exactly:
  *
  *  - [[packStream]] — "concatenate and chop": documents are laid out
  *    end-to-end in a deterministic order and the stream is cut every
  *    `capacity` tokens (the classic GPT-style pretraining layout; documents
  *    may span pack boundaries). Distributed by hashing documents into
  *    independent buckets first: packing is inherently order-sequential, so
  *    a single global order would serialize into one partition — per-bucket
  *    packing keeps every bucket an independent window partition, which is
  *    how packing actually shards on a 1000-executor corpus.
  *  - [[chunkByTokens]] — sliding-window chunking with overlap (window `w`,
  *    stride `s`): each document independently yields chunks of `w` tokens
  *    every `s` tokens (the RAG / long-doc fine-tuning layout). Embarrassingly
  *    parallel — no shuffle at all; the explode runs inside the scan stage.
  */
object Packing {

  /** Deterministic pack assignment, one output row per input row:
    * `bucket` (salted hash bucket the doc was routed to), `n_tok` (the doc's
    * token count), `pack_first`/`pack_last` (first/last pack index within the
    * bucket that the doc occupies), `pack_offset` (token offset of the doc's
    * first token inside `pack_first`), `n_packs` (how many packs the doc
    * spans; 0 for empty docs, which occupy no stream positions).
    *
    * Within a bucket, docs are ordered by `idCol` (must be unique — ties
    * would make the layout nondeterministic). ONE shuffle (the window
    * partition on `bucket`); `nBuckets` sizes the parallelism and should be
    * a small multiple of the cluster's cores at scale.
    *
    * The output columns `bucket`/`n_tok`/`pack_first`/`pack_offset`/
    * `pack_last`/`n_packs` are reserved: inputs already carrying one of
    * those names are rejected (a silent `withColumn` overwrite would
    * corrupt the caller's data) — except an input `n_tok` that the
    * `nTokens` expression itself reads, where the overwrite IS the
    * documented output (the clamped count). Negative `nTokens` values
    * clamp to 0 —
    * the same rule as the streaming twin
    * ([[graft.streaming.StreamingPacking.packStreamOnline]]), so the
    * documented batch/streaming equivalence holds for any input. Pack
    * indices use exact integer division (`div`), not double `/`: beyond
    * 2^53 cumulative tokens per bucket — real at 100 TB — double math is
    * off by one. */
  def packStream(df: DataFrame, idCol: String, nTokens: Column,
      capacity: Long, nBuckets: Int = 32,
      salt: String = "pack"): DataFrame = {
    require(capacity > 0, s"capacity must be positive: $capacity")
    require(nBuckets > 0, s"nBuckets must be positive: $nBuckets")
    val tokReads = org.apache.spark.sql.graftbridge.Bridge
      .resolvableExpression(nTokens).collect {
        case u: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute => u.name
      }.toSet
    val reserved = Seq("bucket", "pack_first", "pack_offset",
      "pack_last", "n_packs", "__cum") ++
      (if (tokReads.contains("n_tok")) Nil else Seq("n_tok"))
    val clash = df.columns.filter(reserved.contains)
    require(clash.isEmpty,
      s"packStream output columns would overwrite input columns: ${clash.mkString(", ")}")
    val bucket = Sampling.hashBucket(col(idCol), salt) % nBuckets
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("bucket")).orderBy(col(idCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    df.withColumn("bucket", bucket)
      .withColumn("n_tok", greatest(nTokens.cast("long"), lit(0L)))
      .withColumn("__cum", coalesce(sum(col("n_tok")).over(w), lit(0L)))
      .withColumn("pack_first", expr(s"__cum div ${capacity}L"))
      .withColumn("pack_offset", pmod(col("__cum"), lit(capacity)))
      .withColumn("pack_last",
        when(col("n_tok") > 0,
          expr(s"(__cum + n_tok - 1) div ${capacity}L"))
          .otherwise(col("pack_first")))
      .withColumn("n_packs",
        when(col("n_tok") > 0, col("pack_last") - col("pack_first") + 1)
          .otherwise(lit(0L)))
      .drop("__cum")
  }

  /** Whole-document packing — next-fit-decreasing per bucket: the SFT /
    * instruction-tuning layout where documents may NOT span pack
    * boundaries (cf. [[packStream]]'s concatenate-and-chop, where they
    * may). Docs route to deterministic salted hash buckets (the same
    * sharding argument as packStream: bin packing is order-sequential, so
    * buckets are the parallelism unit), and within a bucket fill in
    * (n_tok DESC, id) order: close the open pack when the next doc would
    * overflow `capacity`. Next-fit on the size-sorted stream keeps the
    * layout deterministic and one-pass; a doc alone larger than
    * `capacity` occupies its own pack, flagged `oversize` (split it with
    * [[chunkByTokens]] upstream or drop it). Zero-token docs sort last
    * and attach to whatever pack is open. Pack identity is the
    * (bucket, pack) pair.
    *
    * Distributed shape: ONE shuffle — repartition by bucket + an
    * in-partition sort — then a single sequential fill pass per bucket.
    * The fill recurrence ("close when the next doc would overflow") has
    * no closed window-function form (unlike packStream's running sum), so
    * this is one of the documented imperative passes: state is three
    * longs per OPEN bucket, the pass streams, and the spec pins it
    * against a driver-side replica plus the recursive-SQL oracle replay
    * (q186). Output: input id column, `bucket`, `n_tok`, `pack`,
    * `pack_offset`, `oversize`. */
  def packWhole(df: DataFrame, idCol: String, nTokens: Column,
      capacity: Long, nBuckets: Int = 32,
      salt: String = "pack"): DataFrame = {
    require(capacity > 0, s"capacity must be positive: $capacity")
    require(nBuckets > 0, s"nBuckets must be positive: $nBuckets")
    val reserved = Seq("bucket", "n_tok", "pack", "pack_offset", "oversize")
    val clash = df.columns.filter(c => reserved.contains(c) && c != idCol)
    require(clash.isEmpty,
      s"packWhole output columns would overwrite input columns: ${clash.mkString(", ")}")
    val proj = df
      .select(col(idCol),
        (Sampling.hashBucket(col(idCol), salt) % nBuckets).as("bucket"),
        greatest(nTokens.cast("long"), lit(0L)).as("n_tok"))
      .repartition(col("bucket"))
      .sortWithinPartitions(col("bucket"), col("n_tok").desc, col(idCol))
    val outSchema = org.apache.spark.sql.types.StructType(
      proj.schema.fields ++ Seq(
        org.apache.spark.sql.types.StructField("pack",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("pack_offset",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("oversize",
          org.apache.spark.sql.types.BooleanType, nullable = false)))
    // typed mapPartitions (Row encoder — the id column's type is dynamic),
    // NOT .rdd: the object pass stays inside the SQL engine, so Tungsten
    // serialization and AQE survive across the fill stage
    proj.mapPartitions { it =>
      var cur = Long.MinValue
      var p = 0L
      var f = 0L
      it.map { r =>
        val b = r.getLong(1)
        val n = r.getLong(2)
        if (b != cur) { cur = b; p = 0L; f = 0L }
        if (f + n > capacity && f > 0) { p += 1; f = 0L }
        val off = f
        f += n
        org.apache.spark.sql.Row.fromSeq(
          r.toSeq ++ Seq(p, off, n > capacity))
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
  }

  /** Sliding-window chunks: one output row per (doc, chunk). A doc with `n`
    * tokens yields `1 + ceil(max(n - w, 0) / s)` chunks starting at token
    * offsets `0, s, 2s, …`; the final chunk may be shorter than `w`. Docs
    * with zero tokens yield no rows. Output: the id column, `chunk_idx`,
    * `chunk_tok` (tokens in this chunk), `chunk_text` (space-rejoined).
    *
    * No shuffle: tokenize + explode fuse into the scan stage, so this runs
    * partition-parallel over a 100 TB corpus with no data movement.
    */
  def chunkByTokens(df: DataFrame, idCol: String, textCol: String,
      window: Int, stride: Int): DataFrame = {
    require(window > 0, s"window must be positive: $window")
    require(stride > 0 && stride <= window,
      s"stride must be in [1, window]: $stride")
    val t = tokens(col(textCol))
    val n = size(t)
    // ceil((n - w) / s) in integer math, clamped at 0 extra chunks; the
    // sequence is guarded because Spark's sequence(0, -1) counts DOWN
    val nChunks = lit(1) + floor((greatest(n - window, lit(0)) + (stride - 1))
      / lit(stride)).cast("int")
    val idxs = when(n > 0, sequence(lit(0), nChunks - 1))
      .otherwise(array().cast("array<int>"))
    df.select(col(idCol), t.as("__t"), explode(idxs).as("chunk_idx"))
      .select(col(idCol), col("chunk_idx"),
        slice(col("__t"), col("chunk_idx") * stride + 1, lit(window)).as("__c"))
      .select(col(idCol), col("chunk_idx"),
        size(col("__c")).as("chunk_tok"),
        concat_ws(" ", col("__c")).as("chunk_text"))
  }

  /** Fixed-length TRAINING SEQUENCES from per-document token ids — the
    * model-feed artifact at the end of the tokenizer pipeline
    * ([[TextFunctions.bpeEncodeIds]] → here): each document's id stream
    * (comma-joined string, the engine-portable id surface) splits into
    * `seqLen`-sized windows in order; the final window right-pads with
    * `padId`, and `n_real` carries the unpadded count (the attention-mask
    * boundary a trainer derives masks from). One output row per
    * (document, seq_idx). Documents never mix — cross-document packing is
    * [[packStream]]/[[packWhole]]'s job; this is the per-doc truncation
    * layout. Embarrassingly parallel: pure codegen'd array expressions
    * inside the scan stage, no shuffle at any corpus size. Rows with an
    * empty id stream yield no sequences. */
  def fixedLenSequences(df: DataFrame, idCol: String, idsCol: String,
      seqLen: Int, padId: Long): DataFrame = {
    require(seqLen >= 1, s"seqLen must be positive: $seqLen")
    val nWin = ceil(size(col("__a")) / lit(seqLen.toDouble)).cast("long")
    df.where(col(idsCol).isNotNull && col(idsCol) =!= "")
      .select(col(idCol), split(col(idsCol), ",").as("__a"))
      .select(col(idCol), col("__a"),
        explode(sequence(lit(0L), nWin - 1L)).as("seq_idx"))
      .select(col(idCol), col("seq_idx"),
        slice(col("__a"), (col("seq_idx") * seqLen + 1L).cast("int"),
          lit(seqLen)).as("__w"))
      .select(col(idCol), col("seq_idx"),
        concat_ws(",", concat(col("__w"),
          array_repeat(lit(padId.toString),
            (lit(seqLen) - size(col("__w"))).cast("int")))).as("ids"),
        size(col("__w")).cast("long").as("n_real"))
  }
}
