package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media (image/audio/video) travel as opaque
  * `binary` columns with typed metadata; decode / feature-extraction runs
  * per-partition over batches so a real decoder (JNI/FFI or Arrow-based
  * Python via `mapInArrow`) drops in without touching the pipeline shape.
  *
  * Header decode is REAL: [[decode]] parses PNG (IHDR), JPEG (SOFn
  * segment scan), and GIF (logical screen descriptor) headers for format /
  * width / height — pure JVM byte inspection, no codec dependency — on top
  * of the deterministic byte features (length, first byte, 16-byte
  * checksum). Full pixel decode (the step that genuinely needs a codec
  * library this container lacks) remains the drop-in replacement point:
  * swap the body of [[decode]], keep the signature.
  */
object Multimodal {

  /** A media row: id + opaque payload (as a real pipeline would carry). */
  final case class MediaRecord(id: Long, data: Array[Byte])

  /** Extracted features: byte stats + the parsed image header (format is
    * "png"/"jpeg"/"gif"/"unknown"; width/height are -1 when no header
    * parses). A full decoder would add duration/channels/…. */
  final case class MediaFeatures(id: Long, n_bytes: Long, first_byte: Int,
      checksum16: Long, format: String, width: Int, height: Int)

  private def be16(d: Array[Byte], i: Int): Int =
    ((d(i) & 0xff) << 8) | (d(i + 1) & 0xff)

  private def be32(d: Array[Byte], i: Int): Int =
    ((d(i) & 0xff) << 24) | ((d(i + 1) & 0xff) << 16) |
      ((d(i + 2) & 0xff) << 8) | (d(i + 3) & 0xff)

  /** Parse an image header: (format, width, height), or
    * ("unknown", -1, -1). Reads only the leading bytes — safe on arbitrary
    * (including truncated or non-image) payloads. */
  def imageHeader(d: Array[Byte]): (String, Int, Int) = {
    val PngSig = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)
    if (d.length >= 24 && d.take(8).sameElements(PngSig) &&
        d(12) == 'I' && d(13) == 'H' && d(14) == 'D' && d(15) == 'R')
      ("png", be32(d, 16), be32(d, 20))
    else if (d.length >= 4 && (d(0) & 0xff) == 0xff && (d(1) & 0xff) == 0xd8) {
      // scan JPEG segments for the first SOFn (C0-CF minus C4/C8/CC),
      // which carries precision(1) height(2) width(2) after the length
      var i = 2
      while (i + 9 <= d.length && (d(i) & 0xff) == 0xff) {
        val m = d(i + 1) & 0xff
        if (m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc)
          return ("jpeg", be16(d, i + 7), be16(d, i + 5))
        if (m == 0xd8 || m == 0x01 || (m >= 0xd0 && m <= 0xd9)) i += 2
        else i += 2 + be16(d, i + 2) // segment length includes its own 2 bytes
      }
      ("jpeg", -1, -1) // JPEG signature but no SOF within the payload
    } else if (d.length >= 10 && d(0) == 'G' && d(1) == 'I' && d(2) == 'F' &&
        d(3) == '8' && (d(4) == '7' || d(4) == '9') && d(5) == 'a')
      ("gif",
        (d(6) & 0xff) | ((d(7) & 0xff) << 8),   // little-endian
        (d(8) & 0xff) | ((d(9) & 0xff) << 8))
    else ("unknown", -1, -1)
  }

  /** The decoder: byte stats + real header parse. A full pixel decoder
    * replaces this body (keep the signature). */
  def decode(records: Iterator[MediaRecord]): Iterator[MediaFeatures] =
    records.map { r =>
      val head = r.data.take(16)
      val (fmt, w, h) = imageHeader(r.data)
      MediaFeatures(
        id = r.id,
        n_bytes = r.data.length.toLong,
        first_byte = if (r.data.nonEmpty) r.data(0) & 0xff else -1,
        checksum16 = head.foldLeft(0L)((acc, b) => acc + (b & 0xff)),
        format = fmt, width = w, height = h)
    }

  /** Feature-extract a DataFrame with (idCol: long, binCol: binary).
    * Partition-parallel `mapPartitions` over the typed Dataset: batches of
    * binary payloads stream through the decoder without collecting. */
  def mediaFeatures(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val ds: Dataset[MediaRecord] = df
      .select(col(idCol).cast("long").as("id"), col(binCol).as("data"))
      .as(Encoders.product[MediaRecord])
    ds.mapPartitions(decode)(Encoders.product[MediaFeatures]).toDF()
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
