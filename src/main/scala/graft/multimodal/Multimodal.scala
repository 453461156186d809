package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media (image/audio/video) travel as opaque
  * `binary` columns with typed metadata; decode / feature-extraction runs
  * per-partition over batches so a real decoder (JNI/FFI or Arrow-based
  * Python via `mapInArrow`) drops in without touching the pipeline shape.
  *
  * The decode step itself is STUBBED (this container has no image/audio
  * codecs): [[decodeStub]] computes deterministic pseudo-features (byte
  * length, first byte, checksum of the first 16 bytes) so the Spark-side
  * plumbing — schema, encoders, partition-parallel batch shape — is real
  * and oracle-testable while the codec is a drop-in replacement.
  */
object Multimodal {

  /** A media row: id + opaque payload (as a real pipeline would carry). */
  final case class MediaRecord(id: Long, data: Array[Byte])

  /** Extracted features; a real decoder would add width/height/duration/…. */
  final case class MediaFeatures(id: Long, n_bytes: Long, first_byte: Int, checksum16: Long)

  /** The stub decoder: replace with a real codec (keep the signature). */
  def decodeStub(records: Iterator[MediaRecord]): Iterator[MediaFeatures] =
    records.map { r =>
      val head = r.data.take(16)
      MediaFeatures(
        id = r.id,
        n_bytes = r.data.length.toLong,
        first_byte = if (r.data.nonEmpty) r.data(0) & 0xff else -1,
        checksum16 = head.foldLeft(0L)((acc, b) => acc + (b & 0xff)))
    }

  /** Feature-extract a DataFrame with (idCol: long, binCol: binary).
    * Partition-parallel `mapPartitions` over the typed Dataset: batches of
    * binary payloads stream through the decoder without collecting. */
  def mediaFeatures(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val ds: Dataset[MediaRecord] = df
      .select(col(idCol).cast("long").as("id"), col(binCol).as("data"))
      .as(Encoders.product[MediaRecord])
    ds.mapPartitions(decodeStub)(Encoders.product[MediaFeatures]).toDF()
  }

  /** One sampled frame: source id, frame index, byte offset, stub payload. */
  final case class Frame(id: Long, frame_idx: Int, offset: Long, frame_bytes: Array[Byte])

  /** Frame sampling (the video shape): each payload fans OUT to up to
    * `maxFrames` rows, taking every `stride`-th fixed-size chunk. The
    * chunking is the STUB — a real container parser (mp4 boxes, mkv
    * clusters) drops into the same one-row→many-rows `flatMap` without
    * changing schema or partitioning. Output rows stay on the input's
    * partitions: no shuffle until the caller aggregates. */
  def frameSample(df: DataFrame, idCol: String, binCol: String,
      chunkBytes: Int = 256, stride: Int = 4, maxFrames: Int = 8): DataFrame = {
    require(chunkBytes > 0 && stride > 0 && maxFrames > 0)
    val ds = df.select(col(idCol).cast("long").as("id"), col(binCol).as("data"))
      .as(Encoders.product[MediaRecord])
    ds.mapPartitions(_.flatMap { r =>
      val nChunks = (r.data.length + chunkBytes - 1) / chunkBytes
      (0 until nChunks by stride).take(maxFrames).zipWithIndex.map { case (c, i) =>
        val off = c.toLong * chunkBytes
        Frame(r.id, i, off,
          r.data.slice(off.toInt, math.min(off.toInt + chunkBytes, r.data.length)))
      }
    })(Encoders.product[Frame]).toDF()
  }

  /** Resize-to-embedding (the image shape): payload bytes pooled into a
    * fixed `dim`-length float array (mean of each byte bucket, scaled to
    * [0, 1]); empty payloads give the zero vector. The pooling is the STUB
    * for a real decode+resize, but the contract is the load-bearing part:
    * a fixed-dim `array<float>` column that feeds straight into the
    * [[graft.functions.Similarity]] operators (ANN top-k, cosine near-dup)
    * — media dedup becomes the embedding pipeline with a different front. */
  /** A media-derived embedding row (matches the `embeddings` table shape). */
  final case class MediaVec(id: Long, embedding: Array[Float])

  def resizeToVector(df: DataFrame, idCol: String, binCol: String,
      dim: Int = 64): DataFrame = {
    require(dim > 0)
    val ds = df.select(col(idCol).cast("long").as("id"), col(binCol).as("data"))
      .as(Encoders.product[MediaRecord])
    ds.mapPartitions(_.map { r =>
      val out = new Array[Float](dim)
      if (r.data.nonEmpty) {
        val counts = new Array[Int](dim)
        var i = 0
        while (i < r.data.length) {
          // fixed bucket mapping: byte position spread evenly over dim
          val b = ((i.toLong * dim) / r.data.length).toInt
          out(b) += (r.data(i) & 0xff) / 255.0f
          counts(b) += 1
          i += 1
        }
        var j = 0
        while (j < dim) { if (counts(j) > 0) out(j) /= counts(j); j += 1 }
      }
      MediaVec(r.id, out)
    })(Encoders.product[MediaVec]).toDF()
  }
}
