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
}
