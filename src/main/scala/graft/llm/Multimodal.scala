package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One decoded media record (stubbed features — see [[Multimodal.decodeFeatures]]). */
final case class MediaFeatures(media_id: Long, n_bytes: Long, first_byte: Int, digest: String)

/** Multimodal-column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, plus the batch decode/feature-extract path.
  *
  * The Spark-side plumbing (schema, partition-preserving mapPartitions,
  * batch iteration) is real and tested; the DECODE STEP IS A STUB — this
  * container has no image/audio codecs, so `decodeFeatures` computes
  * deterministic byte-level features (length / first byte / md5) where a
  * production build would call the codec. Swap `stubDecode` for the real
  * decoder; everything around it stays.
  */
object Multimodal {

  /** Wrap a source table into the media layout: opaque binary payload +
    * typed metadata struct. (Here the payload is the UTF-8 text bytes —
    * a stand-in for image bytes with identical plumbing.) */
  def toMediaTable(src: DataFrame, idCol: String, payloadCol: String,
      kind: String): DataFrame =
    src.select(
      col(idCol).cast("long").as("media_id"),
      col(payloadCol).cast("binary").as("payload"),
      struct(
        lit(kind).as("kind"),
        octet_length(col(payloadCol).cast("binary")).cast("long").as("size_bytes"),
        lit(0).as("width"), lit(0).as("height")).as("meta"))

  /** STUB: a real implementation decodes `payload` with a codec library.
    * Deterministic byte-level fake so the pipeline is testable end-to-end. */
  private def stubDecode(id: Long, payload: Array[Byte]): MediaFeatures = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val digest = md.digest(payload).map("%02x".format(_)).mkString
    MediaFeatures(id, payload.length.toLong,
      if (payload.nonEmpty) payload(0) & 0xff else -1, digest)
  }

  /** Batch feature extraction over the binary column: partition-preserving
    * mapPartitions (one codec init per partition, like a Pandas-UDF batch;
    * mapPartitions is justified here — decode is genuinely imperative). */
  def decodeFeatures(media: DataFrame)(implicit spark: SparkSession): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.select("media_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition init site (real codec handle would be created here)
        it.map { case (id, bytes) => stubDecode(id, bytes) }
      }
  }
}
