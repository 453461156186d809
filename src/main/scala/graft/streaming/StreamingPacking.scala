package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming sequence packing — the online variant of
  * [[graft.functions.Packing.packStream]]: documents are laid end-to-end
  * into `capacity`-token packs as they ARRIVE, per deterministic hash
  * bucket, with the per-bucket cursor carried across micro-batches.
  *
  * Semantics vs batch: the batch operator orders each bucket's stream by
  * the id column globally; an unbounded stream cannot be reordered, so here
  * the layout order is arrival order (micro-batch sequence), with ties
  * inside one batch broken by ascending id. When data arrives in id order
  * — or in a single batch — the assignment equals the batch operator's
  * (pinned by StreamingSpec).
  *
  * State: ONE long per bucket (the cumulative token cursor) — state size is
  * bounded by `nBuckets` regardless of stream volume, so no watermark or
  * timeout bookkeeping is needed; this runs forever at constant memory.
  */
object StreamingPacking {

  /** One output row per document: (id, bucket, n_tok, pack_first,
    * pack_offset, pack_last, n_packs) — the batch operator's derived
    * columns. `idCol` must cast to long and be unique per doc. */
  def packStreamOnline(df: DataFrame, idCol: String, nTokens: Column,
      capacity: Long, nBuckets: Int = 32,
      salt: String = "pack"): DataFrame = {
    require(capacity > 0, s"capacity must be positive: $capacity")
    require(nBuckets > 0, s"nBuckets must be positive: $nBuckets")
    val bucket = graft.functions.Sampling.hashBucket(col(idCol), salt) % nBuckets
    val in = df.select(bucket.as("bucket"), col(idCol).cast("long").as("id"),
        nTokens.cast("long").as("n_tok"))
      .as(Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong, Encoders.scalaLong))
    in.groupByKey(_._1)(Encoders.scalaLong)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (b: Long, rows: Iterator[(Long, Long, Long)], state: GroupState[Long]) =>
          var cum = state.getOption.getOrElse(0L)
          val out = rows.toArray.sortBy(_._2).map { case (_, id, nTokRaw) =>
            val nTok = math.max(nTokRaw, 0L)
            val first = cum / capacity
            val off = cum % capacity
            val last = if (nTok > 0) (cum + nTok - 1) / capacity else first
            val nPacks = if (nTok > 0) last - first + 1 else 0L
            cum += nTok
            (id, b, nTok, first, off, last, nPacks)
          }
          state.update(cum)
          out.iterator
      }(Encoders.scalaLong,
        Encoders.product[(Long, Long, Long, Long, Long, Long, Long)])
      .toDF("id", "bucket", "n_tok", "pack_first", "pack_offset",
        "pack_last", "n_packs")
  }
}
