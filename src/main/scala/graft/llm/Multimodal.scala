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

  /** STUB resize: a real implementation decodes, scales to w×h, re-encodes.
    * The stub truncates/zero-pads the payload to w·h bytes so the contract
    * (payload transformed per-record, meta width/height updated, row count
    * and partitioning preserved) is testable without codecs. */
  def resize(media: DataFrame, w: Int, h: Int)(implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    val target = w * h
    val resized = media
      .select(col("media_id"), col("payload"), col("meta.kind").as("kind"))
      .as[(Long, Array[Byte], String)]
      .mapPartitions { it => // per-partition codec init site, as in decodeFeatures
        it.map { case (id, bytes, kind) =>
          (id, java.util.Arrays.copyOf(bytes, target), kind)
        }
      }.toDF("media_id", "payload", "kind")
    resized.select(col("media_id"), col("payload"),
      struct(col("kind"), lit(target.toLong).as("size_bytes"),
        lit(w).as("width"), lit(h).as("height")).as("meta"))
  }

  /** Frame sampling for video-like payloads: every `everyNth` frame of
    * `frameBytes` bytes becomes its own row — declarative row amplification
    * (`explode(sequence)`), so it distributes and prunes like any other
    * lateral view; memory is bounded by one payload per row, never a whole
    * partition of frames. Emits (media_id, frame_idx, frame_off, frame) with
    * the frame slice itself; payloads shorter than one frame produce no
    * rows (matching a decoder that finds no complete frame). */
  def sampleFrames(media: DataFrame, frameBytes: Int, everyNth: Int): DataFrame = {
    val nFrames = (octet_length(col("payload")) / frameBytes).cast("int")
    media
      .select(col("media_id"), col("payload"), nFrames.as("n_frames"))
      .filter(col("n_frames") >= 1)
      .select(col("media_id"), col("payload"),
        explode(sequence(lit(0), col("n_frames") - 1, lit(everyNth))).as("frame_idx"))
      .select(col("media_id"), col("frame_idx"),
        (col("frame_idx") * frameBytes).as("frame_off"),
        expr(s"substring(payload, frame_idx * $frameBytes + 1, $frameBytes)").as("frame"))
  }
}
