package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One decoded media record (stubbed features — see [[Multimodal.decodeFeatures]]). */
final case class MediaFeatures(media_id: Long, n_bytes: Long, first_byte: Int, digest: String)

/** One REAL image decode (see [[Multimodal.decodeImageFeatures]]): pixel
  * dimensions + mean luminance when the payload is a decodable image
  * (`decoded = true`), byte-level fallback features otherwise. */
final case class ImageFeatures(media_id: Long, decoded: Boolean,
    width: Int, height: Int, mean_luma: Double, n_bytes: Long, digest: String)

/** One REAL audio decode (see [[Multimodal.decodeAudioFeatures]]): format
  * parameters + RMS amplitude (16-bit PCM) when the payload is a decodable
  * audio stream, byte-level fallback otherwise. */
final case class AudioFeatures(media_id: Long, decoded: Boolean,
    sample_rate: Double, channels: Int, frames: Long, rms: Double, n_bytes: Long)

/** Multimodal-column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, plus the batch decode/feature-extract path.
  *
  * The Spark-side plumbing (schema, partition-preserving mapPartitions,
  * batch iteration) is real and tested. IMAGES decode for real
  * ([[Multimodal.decodeImageFeatures]] / [[Multimodal.resizeImages]], JDK
  * `javax.imageio` — PNG/BMP/GIF/JPEG) and so does AUDIO
  * ([[Multimodal.decodeAudioFeatures]], JDK `javax.sound.sampled` —
  * WAV/AU/AIFF), each with a byte-level fallback for undecodable payloads.
  * Only VIDEO decode remains a documented stub (`decodeFeatures` computes
  * deterministic byte-level features; no JDK video codec exists) — swap
  * `stubDecode` for the real decoder; everything around it stays.
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

  /** REAL image decode via `javax.imageio` (JDK-built-in PNG/BMP/GIF/JPEG
    * codecs — no external library): pixel dimensions + mean luminance
    * (ITU-R BT.601 weights). Payloads ImageIO can't decode fall back to the
    * byte-level features with `decoded = false`, so mixed/corrupt corpora
    * flow through instead of failing the task — the standard posture for
    * web-scale media ingestion. Headless-safe: BufferedImage decoding needs
    * no display. Same partition-preserving mapPartitions shape as
    * [[decodeFeatures]]; ImageIO's per-JVM registry is the per-partition
    * "codec init". */
  def decodeImageFeatures(media: DataFrame)(implicit spark: SparkSession): Dataset[ImageFeatures] = {
    import spark.implicits._
    media.select("media_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions { it =>
        System.setProperty("java.awt.headless", "true")
        it.map { case (id, bytes) =>
          val md = java.security.MessageDigest.getInstance("MD5")
          val digest = md.digest(bytes).map("%02x".format(_)).mkString
          val img =
            try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
            catch { case _: Exception => null }
          if (img == null)
            ImageFeatures(id, decoded = false, -1, -1, -1.0, bytes.length.toLong, digest)
          else {
            var sum = 0.0
            var y = 0
            while (y < img.getHeight) {
              var x = 0
              while (x < img.getWidth) {
                val rgb = img.getRGB(x, y)
                sum += 0.299 * ((rgb >> 16) & 0xff) + 0.587 * ((rgb >> 8) & 0xff) +
                  0.114 * (rgb & 0xff)
                x += 1
              }
              y += 1
            }
            ImageFeatures(id, decoded = true, img.getWidth, img.getHeight,
              sum / (img.getWidth.toLong * img.getHeight), bytes.length.toLong, digest)
          }
        }
      }
  }

  /** REAL audio decode via `javax.sound.sampled` (JDK-built-in WAV/AU/AIFF
    * readers — no external library): sample rate, channel count, frame
    * length, and RMS amplitude (computed for 16-bit signed PCM, the WAV
    * default; -1 otherwise). Undecodable payloads fall back with
    * `decoded = false`, same mixed-corpus posture as
    * [[decodeImageFeatures]]. */
  def decodeAudioFeatures(media: DataFrame)(implicit spark: SparkSession): Dataset[AudioFeatures] = {
    import spark.implicits._
    media.select("media_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          try {
            val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
              new java.io.ByteArrayInputStream(bytes))
            val fmt = ais.getFormat
            val rms =
              if (fmt.getSampleSizeInBits == 16 &&
                  fmt.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED) {
                val data = ais.readAllBytes()
                var sum = 0.0
                var n = 0
                var i = 0
                while (i + 1 < data.length) {
                  val s =
                    if (fmt.isBigEndian) ((data(i) << 8) | (data(i + 1) & 0xff)).toShort
                    else ((data(i + 1) << 8) | (data(i) & 0xff)).toShort
                  val v = s / 32768.0
                  sum += v * v; n += 1; i += 2
                }
                if (n > 0) math.sqrt(sum / n) else -1.0
              } else -1.0
            AudioFeatures(id, decoded = true, fmt.getSampleRate.toDouble,
              fmt.getChannels, ais.getFrameLength, rms, bytes.length.toLong)
          } catch {
            case _: Exception =>
              AudioFeatures(id, decoded = false, -1.0, -1, -1L, -1.0, bytes.length.toLong)
          }
        }
      }
  }

  /** REAL image resize: ImageIO decode → Graphics2D scale to w×h → PNG
    * re-encode, with meta width/height updated. Non-decodable payloads fall
    * back to the byte-truncation stub (flagged by `meta.kind` suffix
    * `:undecoded`), keeping row count and partitioning intact. */
  def resizeImages(media: DataFrame, w: Int, h: Int)(implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    val resized = media
      .select(col("media_id"), col("payload"), col("meta.kind").as("kind"))
      .as[(Long, Array[Byte], String)]
      .mapPartitions { it =>
        System.setProperty("java.awt.headless", "true")
        it.map { case (id, bytes, kind) =>
          val img =
            try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
            catch { case _: Exception => null }
          if (img == null)
            (id, java.util.Arrays.copyOf(bytes, w * h), s"$kind:undecoded")
          else {
            val out = new java.awt.image.BufferedImage(w, h,
              java.awt.image.BufferedImage.TYPE_INT_RGB)
            val g = out.createGraphics()
            g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
              java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
            g.drawImage(img, 0, 0, w, h, null)
            g.dispose()
            val buf = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(out, "png", buf)
            (id, buf.toByteArray, kind)
          }
        }
      }.toDF("media_id", "payload", "kind")
    resized.select(col("media_id"), col("payload"),
      struct(col("kind"), octet_length(col("payload")).cast("long").as("size_bytes"),
        lit(w).as("width"), lit(h).as("height")).as("meta"))
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
