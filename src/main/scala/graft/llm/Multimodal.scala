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

/** One REAL decoded video frame (see [[Multimodal.decodeVideoFrames]]):
  * pixel dimensions + mean luminance per MJPEG frame. A payload with no
  * decodable frame yields a single `decoded = false` fallback row
  * (`frame_idx = -1`), same mixed-corpus posture as image/audio. */
final case class VideoFrameFeatures(media_id: Long, decoded: Boolean,
    frame_idx: Int, width: Int, height: Int, mean_luma: Double, n_bytes: Long)

/** Multimodal-column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, plus the batch decode/feature-extract path.
  *
  * The Spark-side plumbing (schema, partition-preserving mapPartitions,
  * batch iteration) is real and tested. IMAGES decode for real
  * ([[Multimodal.decodeImageFeatures]] / [[Multimodal.resizeImages]], JDK
  * `javax.imageio` — PNG/BMP/GIF/JPEG), AUDIO decodes for real
  * ([[Multimodal.decodeAudioFeatures]], JDK `javax.sound.sampled` —
  * WAV/AU/AIFF), and VIDEO decodes for real in the MJPEG container
  * ([[Multimodal.decodeVideoFrames]] — concatenated JPEG frames split on
  * SOI/EOI markers, each frame through the ImageIO path). Every decoder has
  * a byte-level fallback for undecodable payloads, so mixed/corrupt corpora
  * flow through instead of failing the task. Non-MJPEG video containers
  * (H.264 in MP4 etc.) have no JDK codec — those payloads take the
  * `decoded = false` fallback rather than a wrong answer.
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
        // in-memory payloads: ImageIO's default disk cache writes a temp
        // file per decoded stream — pure overhead here, and temp-dir churn
        // under 32 concurrent decode tasks
        javax.imageio.ImageIO.setUseCache(false)
        it.map { case (id, bytes) =>
          val md = java.security.MessageDigest.getInstance("MD5")
          val digest = md.digest(bytes).map("%02x".format(_)).mkString
          val img =
            try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
            catch { case _: Exception => null }
          if (img == null)
            ImageFeatures(id, decoded = false, -1, -1, -1.0, bytes.length.toLong, digest)
          else
            ImageFeatures(id, decoded = true, img.getWidth, img.getHeight,
              meanLuma(img), bytes.length.toLong, digest)
        }
      }
  }

  /** Mean luminance over all pixels, ITU-R BT.601 weights. */
  private def meanLuma(img: java.awt.image.BufferedImage): Double = {
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
    sum / (img.getWidth.toLong * img.getHeight)
  }

  /** Split an MJPEG payload (concatenated JPEG images) into per-frame byte
    * slices: each frame runs from an SOI marker (FF D8 FF) to the next EOI
    * (FF D9). Inside a JPEG, 0xFF bytes in entropy-coded data are stuffed
    * as FF 00 and restart markers are FF D0–D7, so EOI cannot appear before
    * the frame's true end — the standard naive MJPEG splitter. Truncated
    * trailing data (SOI with no EOI) is dropped, matching a decoder that
    * finds no complete frame. */
  private[llm] def splitMjpeg(bytes: Array[Byte]): Seq[Array[Byte]] = {
    val out = Seq.newBuilder[Array[Byte]]
    var i = 0
    while (i + 3 < bytes.length) {
      if (bytes(i) == 0xFF.toByte && bytes(i + 1) == 0xD8.toByte &&
          bytes(i + 2) == 0xFF.toByte) {
        var j = i + 2
        var end = -1
        while (end < 0 && j + 1 < bytes.length) {
          if (bytes(j) == 0xFF.toByte && bytes(j + 1) == 0xD9.toByte) end = j + 2
          j += 1
        }
        if (end < 0) i = bytes.length
        else { out += java.util.Arrays.copyOfRange(bytes, i, end); i = end }
      } else i += 1
    }
    out.result()
  }

  /** REAL video decode for the MJPEG container: split the payload into JPEG
    * frames ([[splitMjpeg]]), decode each through the same JDK ImageIO path
    * as still images, and emit one row per frame with pixel dimensions and
    * mean luminance. Payloads yielding no decodable frame produce a single
    * `decoded = false` fallback row (`frame_idx = -1`) so corrupt or
    * non-MJPEG media flow through, never fail the task. Row amplification
    * happens inside the partition (one payload in flight at a time), so
    * memory is bounded by a single payload's frames, and the output
    * distributes/prunes like any flatMap. */
  def decodeVideoFrames(media: DataFrame)(implicit spark: SparkSession): Dataset[VideoFrameFeatures] = {
    import spark.implicits._
    media.select("media_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions { it =>
        System.setProperty("java.awt.headless", "true")
        // in-memory payloads: ImageIO's default disk cache writes a temp
        // file per decoded stream — pure overhead here, and temp-dir churn
        // under 32 concurrent decode tasks
        javax.imageio.ImageIO.setUseCache(false)
        it.flatMap { case (id, bytes) =>
          val decoded = splitMjpeg(bytes).iterator.map { frame =>
            try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(frame))
            catch { case _: Exception => null }
          }.filter(_ != null).zipWithIndex.map { case (img, idx) =>
            VideoFrameFeatures(id, decoded = true, idx, img.getWidth,
              img.getHeight, meanLuma(img), bytes.length.toLong)
          }.toSeq
          if (decoded.nonEmpty) decoded
          else Seq(VideoFrameFeatures(id, decoded = false, -1, -1, -1, -1.0,
            bytes.length.toLong))
        }
      }
  }

  /** Structured-PNG fixture for the PERCEPTUAL-HASH oracle: a 32×32 image
    * of 8×8 constant-color 4-pixel blocks (the standard 64-bit aHash
    * geometry). Block i's gray level is the pure function
    * `40 + (id%7)·20 + ((i·37 + (id%7)·11) % 64) + (id/7)%3`
    * — images sharing `id % 7` have the SAME block pattern shifted by a
    * small UNIFORM brightness offset (the id/7 term), i.e. perceptual
    * near-duplicates whose bytes (and md5) differ. Max value 225, so no
    * clamping; PNG is lossless, so every decoded pixel is the formula's
    * integer exactly. */
  def synthPatternPngTable(ids: DataFrame)(implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    ids.select(col(ids.columns.head).cast("long")).as[Long]
      .mapPartitions { it =>
        System.setProperty("java.awt.headless", "true")
        // in-memory payloads: ImageIO's default disk cache writes a temp
        // file per decoded stream — pure overhead here, and temp-dir churn
        // under 32 concurrent decode tasks
        javax.imageio.ImageIO.setUseCache(false)
        it.map { id =>
          val g = (id % 7).toInt
          val off = ((id / 7) % 3).toInt
          val img = new java.awt.image.BufferedImage(32, 32,
            java.awt.image.BufferedImage.TYPE_INT_RGB)
          val gr = img.createGraphics()
          for (by <- 0 until 8; bx <- 0 until 8) {
            val i = by * 8 + bx
            val v = 40 + g * 20 + ((i * 37 + g * 11) % 64) + off
            gr.setColor(new java.awt.Color(v, v, v))
            gr.fillRect(bx * 4, by * 4, 4, 4)
          }
          gr.dispose()
          val buf = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "png", buf)
          (id, buf.toByteArray)
        }
      }.toDF("media_id", "payload")
  }

  /** NEAR-duplicate variant of [[synthPatternPngTable]]: same block
    * formula, but images with `id % 11 == 0` get block `id % 64` dimmed
    * by 37 — a LOCAL edit (one logo/watermark block changed), so the
    * perturbed image's aHash differs from its id%7 siblings' in the
    * edited bit plus any blocks the −37/64 mean shift drags across the
    * threshold: a genuinely NONZERO, small Hamming distance. All values
    * stay in [3, 225] (no clamping) and PNG is lossless, so a SQL oracle
    * replays every pixel, the exact dyadic mean, and each threshold bit. */
  def synthNearDupPngTable(ids: DataFrame)(implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    ids.select(col(ids.columns.head).cast("long")).as[Long]
      .mapPartitions { it =>
        System.setProperty("java.awt.headless", "true")
        // in-memory payloads: ImageIO's default disk cache writes a temp
        // file per decoded stream — pure overhead here, and temp-dir churn
        // under 32 concurrent decode tasks
        javax.imageio.ImageIO.setUseCache(false)
        it.map { id =>
          val g = (id % 7).toInt
          val off = ((id / 7) % 3).toInt
          val img = new java.awt.image.BufferedImage(32, 32,
            java.awt.image.BufferedImage.TYPE_INT_RGB)
          val gr = img.createGraphics()
          for (by <- 0 until 8; bx <- 0 until 8) {
            val i = by * 8 + bx
            val dim = if (id % 11 == 0 && i == (id % 64).toInt) 37 else 0
            val v = 40 + g * 20 + ((i * 37 + g * 11) % 64) + off - dim
            gr.setColor(new java.awt.Color(v, v, v))
            gr.fillRect(bx * 4, by * 4, 4, 4)
          }
          gr.dispose()
          val buf = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "png", buf)
          (id, buf.toByteArray)
        }
      }.toDF("media_id", "payload")
  }

  /** 64-bit AVERAGE HASH (aHash) from REAL decoded pixels: partition the
    * image into an 8×8 block grid (the standard perceptual-hash width —
    * 64 bits is what real pHash/dHash implementations emit), bit i set iff
    * block i's gray level exceeds the image mean. The perceptual-dedup
    * property under test: a uniform brightness shift moves every block AND
    * the mean by the same amount, so the hash is EXACTLY invariant —
    * brightness-shifted re-encodes (different bytes, different md5)
    * collapse to one hash, which is what byte-level dedup can never do.
    * Block gray is read as the raw blue channel integer and the mean is
    * Σv/64 (exact dyadic), so the strict `>` resolves identically in the
    * SQL oracle (which builds the hash as HUGEINT and folds to signed
    * BIGINT — bit 63 makes the Long negative on both engines).
    * Undecodable payloads yield `decoded=false, phash=-1`. */
  def imageAHash(media: DataFrame)(implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    media.select("media_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions { it =>
        System.setProperty("java.awt.headless", "true")
        // in-memory payloads: ImageIO's default disk cache writes a temp
        // file per decoded stream — pure overhead here, and temp-dir churn
        // under 32 concurrent decode tasks
        javax.imageio.ImageIO.setUseCache(false)
        it.map { case (id, bytes) =>
          val img =
            try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
            catch { case _: Exception => null }
          if (img == null || img.getWidth < 32 || img.getHeight < 32)
            (id, false, -1L)
          else {
            val vs = Array.tabulate(64) { i =>
              img.getRGB((i % 8) * 4, (i / 8) * 4) & 0xff
            }
            val mean = vs.sum / 64.0
            var hash = 0L
            var i = 0
            while (i < 64) {
              if (vs(i) > mean) hash |= 1L << i
              i += 1
            }
            (id, true, hash)
          }
        }
      }.toDF("media_id", "decoded", "phash")
  }

  /** PERCEPTUAL image near-dup summary — the image-modality member of the
    * dedup family (text has MinHash/SimHash, embeddings have sign-LSH;
    * this is the same banded-LSH shape over [[imageAHash]] bits). Bands
    * the 64-bit aHash into four 16-bit slices and self-joins per slice:
    * by pigeonhole, any pair within Hamming ≤ 3 shares at least one
    * intact band, so for `maxHamming ≤ 3` the banding is EXACT, not
    * approximate — candidates shrink by the band-bucket selectivity while
    * recall stays 1.0. Candidates verify on the full 64-bit Hamming
    * distance, then fold to one row per image: the min-id neighbor as the
    * cluster representative and the neighbor count (on near-dup CLIQUES —
    * re-encodes/brightness shifts of one source — min-neighbor equals the
    * component min; for chained duplicates feed the pair list into
    * [[Dedup.clusters]] exactly like the text path).
    *
    * Shape at 100 TB: decode + hash are scan-local mapPartitions
    * (per-partition codec init); the hashed frame is 16 bytes/image and
    * pinned ([[Dedup.pin]] — consumed by both join sides and the final
    * left join); the band self-join runs over DISTINCT hashes bucketed by
    * (band, 16-bit sig) — 262,144 buckets, exact-dup cliques pre-collapsed
    * (see [[hashNearDupPairs]]) — never payload bytes; `bit_count(a^b)`
    * is codegen'd integer arithmetic. Payloads are read ONCE, at the scan.
    */
  def imageNearDups(media: DataFrame, maxHamming: Int)
      (implicit spark: SparkSession): DataFrame = {
    val hashed = Dedup.pin(imageAHash(media).filter(col("decoded"))
      .select(col("media_id").as("id"), col("phash")))
    // Per-id aggregates WITHOUT materializing clique pairs — the exact
    // consumer [[hashNearDupPairs]]' scaladoc warns about: id-pair rows
    // are quadratic in clique size, so a corpus whose duplicate cliques
    // grow with the data (every real crawl) blows up the pair frame
    // (round-10 sf1 sweep: the pair form ran ×40 when fixture cliques
    // grew 10×). Same-hash cliques contribute (|clique|−1) neighbors
    // and their min id ALGEBRAICALLY from one per-hash collapse;
    // cross-hash candidates aggregate at the HASH level (bounded by
    // distinct hashes, not ids). rep = least(id, hmin, crossMin)
    // reproduces the pair-form rep in every case: for the clique min
    // itself, hmin == id and only a smaller cross neighbor can win.
    val perHash = Dedup.pin(hashed.groupBy("phash")
      .agg(count(lit(1)).as("hcnt"), min(col("id")).as("hmin")))
    val hp = bandedHashPairs(perHash.select("phash"), maxHamming,
      Int.MaxValue)
    // one-pass symmetrization (explode, not union — the r5 lesson)
    val sym = hp.select(explode(array(
        struct(col("h1").as("h"), col("h2").as("o")),
        struct(col("h2").as("h"), col("h1").as("o")))).as("e"))
      .select(col("e.h").as("phash"), col("e.o").as("op"))
    val cross = sym
      .join(perHash.select(col("phash").as("op"), col("hcnt").as("ocnt"),
        col("hmin").as("omin")), "op")
      .groupBy("phash")
      .agg(sum("ocnt").as("crossCnt"), min("omin").as("crossMin"))
    hashed.join(perHash, "phash")
      .join(cross, Seq("phash"), "left")
      .select(col("id").as("media_id"),
        least(col("id"), col("hmin"), coalesce(col("crossMin"), col("id")))
          .as("rep"),
        (col("hcnt") - 1 + coalesce(col("crossCnt"), lit(0L)))
          .as("n_nbrs"))
  }

  /** Banded Hamming pair generation over a precomputed `(id, phash)` frame
    * (64-bit hashes): four 16-bit band slices, self-join per slice over
    * DISTINCT hashes, popcount verify, then expand back to id pairs.
    * EXACT for `maxHamming ≤ 3` — any pair differing in ≤ 3 bits leaves
    * at least one of the four bands untouched (pigeonhole), so banding
    * prunes candidates without losing a single true pair; PropertySpec
    * mechanizes this claim over random 64-bit hashes.
    *
    * Two scale levers vs the naive per-id band join (the round-6 weak):
    *  - 16-bit bands: 65,536 sigs per band → 262,144 (band, sig) buckets
    *    (vs 1,024 with 8-bit bands over a 32-bit hash), so per-bucket
    *    density — and the quadratic per-bucket candidate count — drops
    *    256×. SCALE.md carries the density math at 10⁹ images.
    *  - the self-join runs over DISTINCT hash values, not ids: exact-dup
    *    cliques (the dominant mass of a real image corpus — re-encodes,
    *    thumbnails, mirrors of one source) collapse to ONE row before any
    *    bucket forms, so a 10⁶-copy viral image contributes one bucket row
    *    instead of a 10¹²-pair self-join. Same-hash id pairs re-enter at
    *    the end as Hamming-0 rows via a per-hash-group self-join, and
    *    cross-hash candidates expand through the (hash → ids) map — both
    *    joins keyed on the full 64-bit hash.
    *
    * Returns (d1 < d2, hamming). The id-pair OUTPUT is still quadratic in
    * clique size by definition; [[imageNearDups]]-style consumers that
    * only need per-id aggregates should aggregate per hash group instead
    * of materializing clique pairs when that matters. */
  def hashNearDupPairs(hashed: DataFrame, maxHamming: Int): DataFrame =
    hashNearDupPairs(hashed, maxHamming, maxBucket = Int.MaxValue)

  /** [[hashNearDupPairs]] with a per-bucket density cap — the df-cap escape
    * hatch for DEGENERATE corpora (solid-color frames, near-constant
    * thumbnails) where one (band, sig) bucket of distinct hashes would
    * otherwise quadratically dominate: buckets holding more than
    * `maxBucket` DISTINCT hashes are removed from the candidate join by a
    * broadcast anti-join before any pairing (the hot set is tiny by Zipf —
    * the same mitigation as hot shingles, Dedup.keptShingles). Below the
    * cap the result is bit-identical to the uncapped computation; when the
    * cap engages, pairs whose ONLY intact band was hot are missed — a
    * measured recall trade documented in SCALE.md, chosen over the job
    * dying. Exact-dup (Hamming-0) pairs are NEVER affected: they pair on
    * the full hash, not through a band bucket. */
  def hashNearDupPairs(hashed: DataFrame, maxHamming: Int, maxBucket: Int): DataFrame = {
    val ids = Dedup.pin(hashed.select(col("id"), col("phash")))
    val hashPairs =
      bandedHashPairs(ids.select("phash").distinct(), maxHamming, maxBucket)
    // cross-hash id pairs: expand (h1, h2) through the hash → ids map
    val a = ids.select(col("id").as("ia"), col("phash").as("h1"))
    val b = ids.select(col("id").as("ib"), col("phash").as("h2"))
    val cross = hashPairs.join(a, "h1").join(b, "h2")
      .select(least(col("ia"), col("ib")).as("d1"),
        greatest(col("ia"), col("ib")).as("d2"), col("hamming"))
    // same-hash id pairs (Hamming 0): per-clique self-join on the full hash
    val same = ids.as("x").join(ids.as("y"),
        col("x.phash") === col("y.phash") && col("x.id") < col("y.id"))
      .select(col("x.id").as("d1"), col("y.id").as("d2"), lit(0).as("hamming"))
    cross.unionByName(same)
  }

  /** The HASH-level banded near-dup pair stage shared by
    * [[hashNearDupPairs]] (which expands pairs back to ids) and
    * [[imageNearDups]] (which aggregates per hash and never expands):
    * four 16-bit band slices over a DISTINCT-hash frame, self-join per
    * (band, sig) bucket, popcount verify. Returns (h1 < h2, hamming ≤
    * maxHamming). Buckets holding more than `maxBucket` distinct hashes
    * are dropped first (see the capped [[hashNearDupPairs]] overload). */
  private def bandedHashPairs(hashes: DataFrame, maxHamming: Int,
      maxBucket: Int): DataFrame = {
    require(maxHamming <= 3, s"4x16-bit banding is exact only to Hamming 3")
    val hs = Dedup.pin(hashes.select("phash"))
    val bandsAll = hs.select(col("phash"), explode(array(
      (0 until 4).map(b => struct(lit(b).as("band"),
        shiftright(col("phash"), b * 16).bitwiseAND(lit(65535L)).as("sig"))): _*))
      .as("bs"))
      .select(col("phash"), col("bs.band").as("band"), col("bs.sig").as("sig"))
    val bands =
      if (maxBucket == Int.MaxValue) bandsAll
      else {
        val pinned = Dedup.pin(bandsAll)
        val hot = pinned.groupBy("band", "sig")
          .agg(count(lit(1)).as("n")).filter(col("n") > maxBucket)
          .select("band", "sig")
        pinned.join(broadcast(hot), Seq("band", "sig"), "left_anti")
      }
    val l = bands.as("l"); val r = bands.as("r")
    // hash-level near-dup pairs, canonicalized h1 < h2 (hash VALUE order)
    l.join(r, col("l.band") === col("r.band")
        && col("l.sig") === col("r.sig") && col("l.phash") < col("r.phash"))
      .select(col("l.phash").as("h1"), col("r.phash").as("h2"),
        bit_count(expr("l.phash ^ r.phash")).as("hamming"))
      .distinct() // a pair found by several bands collapses before the filter
      .filter(col("hamming") <= maxHamming)
  }

  /** Deterministic PNG fixture corpus for the image-decode oracle: every
    * 5th id a garbage payload, the rest a solid-gray PNG whose dimensions
    * `(4 + id%4*4) × (4 + id%3*4)` and gray level `32 + id%8*24` are pure
    * functions of the id. PNG is LOSSLESS, so decoded mean luminance is
    * exactly the BT.601 luma of the gray level — a SQL oracle predicts it
    * to the rounded-double bit, unlike the JPEG fixtures where
    * quantization needs a tolerance band. */
  def synthPngTable(ids: DataFrame)(implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    ids.select(col(ids.columns.head).cast("long")).as[Long]
      .mapPartitions { it =>
        System.setProperty("java.awt.headless", "true")
        // in-memory payloads: ImageIO's default disk cache writes a temp
        // file per decoded stream — pure overhead here, and temp-dir churn
        // under 32 concurrent decode tasks
        javax.imageio.ImageIO.setUseCache(false)
        it.map { id =>
          if (id % 5 == 0) (id, s"not a png payload #$id".getBytes("UTF-8"))
          else {
            val w = (4 + (id % 4) * 4).toInt
            val h = (4 + (id % 3) * 4).toInt
            val v = (32 + (id % 8) * 24).toInt
            val img = new java.awt.image.BufferedImage(w, h,
              java.awt.image.BufferedImage.TYPE_INT_RGB)
            val g = img.createGraphics()
            g.setColor(new java.awt.Color(v, v, v))
            g.fillRect(0, 0, w, h)
            g.dispose()
            val buf = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(img, "png", buf)
            (id, buf.toByteArray)
          }
        }
      }.toDF("media_id", "payload")
  }

  /** Deterministic WAV fixture corpus for the audio-decode oracle: every
    * 5th id garbage, the rest 16-bit mono PCM at 8 kHz with
    * `1000 + id%4*500` frames of the CONSTANT sample `(id%8+1)·1024` —
    * dyadic amplitude, so the decoded RMS is exactly `(id%8+1)/32`
    * (every intermediate is a small integer over a power of two; IEEE
    * arithmetic is exact end-to-end). */
  def synthWavTable(ids: DataFrame)(implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    ids.select(col(ids.columns.head).cast("long")).as[Long]
      .mapPartitions { it =>
        it.map { id =>
          if (id % 5 == 0) (id, s"not a wav payload #$id".getBytes("UTF-8"))
          else {
            val n = (1000 + (id % 4) * 500).toInt
            val s = (((id % 8) + 1) * 1024).toShort
            val pcm = new Array[Byte](n * 2)
            var i = 0
            while (i < n) {
              pcm(2 * i) = (s & 0xff).toByte
              pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
              i += 1
            }
            val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
            val ais = new javax.sound.sampled.AudioInputStream(
              new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
            val buf = new java.io.ByteArrayOutputStream()
            javax.sound.sampled.AudioSystem.write(ais,
              javax.sound.sampled.AudioFileFormat.Type.WAVE, buf)
            (id, buf.toByteArray)
          }
        }
      }.toDF("media_id", "payload")
  }

  /** Deterministic MJPEG fixture corpus for the video-decode oracle: for
    * each id, either a garbage (non-JPEG) payload — every 5th id — or
    * `1 + id%3` solid-gray JPEG frames of `(8 + id%3*8) × (8 + id%2*8)`
    * pixels at gray level `64 + id%4*32`, concatenated. Every parameter is
    * a pure function of the id, so a SQL oracle can predict frame counts,
    * dimensions, and (within JPEG quantization error) mean luminance
    * without decoding anything. */
  def synthMjpegTable(ids: DataFrame)(implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    ids.select(col(ids.columns.head).cast("long")).as[Long]
      .mapPartitions { it =>
        System.setProperty("java.awt.headless", "true")
        // in-memory payloads: ImageIO's default disk cache writes a temp
        // file per decoded stream — pure overhead here, and temp-dir churn
        // under 32 concurrent decode tasks
        javax.imageio.ImageIO.setUseCache(false)
        it.map { id =>
          if (id % 5 == 0) (id, s"not an mjpeg payload #$id".getBytes("UTF-8"))
          else {
            val n = (1 + id % 3).toInt
            val w = (8 + (id % 3) * 8).toInt
            val h = (8 + (id % 2) * 8).toInt
            val v = (64 + (id % 4) * 32).toInt
            val buf = new java.io.ByteArrayOutputStream()
            var i = 0
            while (i < n) {
              val img = new java.awt.image.BufferedImage(w, h,
                java.awt.image.BufferedImage.TYPE_INT_RGB)
              val g = img.createGraphics()
              g.setColor(new java.awt.Color(v, v, v))
              g.fillRect(0, 0, w, h)
              g.dispose()
              javax.imageio.ImageIO.write(img, "jpg", buf)
              i += 1
            }
            (id, buf.toByteArray)
          }
        }
      }.toDF("media_id", "payload")
  }

  /** MJPEG fixture WITH SCENE CHANGES for the cut-detection oracle: frame
    * i of video `id` is a constant-gray JPEG at level 160 when
    * `(id + i) % 3 == 0`, else 64 — so the exact cut positions (and count)
    * are a pure function of the id, predictable in SQL without decoding.
    * The 96-level jumps dwarf JPEG quantization error (±2/frame), so a
    * threshold of 16 classifies every frame pair deterministically.
    * Every 5th id is a garbage payload (mixed-corpus posture). */
  def synthSceneMjpegTable(ids: DataFrame)(implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    ids.select(col(ids.columns.head).cast("long")).as[Long]
      .mapPartitions { it =>
        System.setProperty("java.awt.headless", "true")
        javax.imageio.ImageIO.setUseCache(false)
        it.map { id =>
          if (id % 5 == 0) (id, s"not an mjpeg payload #$id".getBytes("UTF-8"))
          else {
            val n = (2 + id % 4).toInt
            val w = (8 + (id % 3) * 8).toInt
            val h = (8 + (id % 2) * 8).toInt
            val buf = new java.io.ByteArrayOutputStream()
            var i = 0
            while (i < n) {
              val v = if ((id + i) % 3 == 0) 160 else 64
              val img = new java.awt.image.BufferedImage(w, h,
                java.awt.image.BufferedImage.TYPE_INT_RGB)
              val g = img.createGraphics()
              g.setColor(new java.awt.Color(v, v, v))
              g.fillRect(0, 0, w, h)
              g.dispose()
              javax.imageio.ImageIO.write(img, "jpg", buf)
              i += 1
            }
            (id, buf.toByteArray)
          }
        }
      }.toDF("media_id", "payload")
  }

  /** Scene-cut detection over REAL decoded video frames: a cut between
    * consecutive frames when mean luminance jumps by more than
    * `threshold`. Decode is the scan-local [[decodeVideoFrames]]
    * mapPartitions; the lag/compare runs under ONE shuffle on media_id
    * (per-video frame counts are bounded — a video's frames sort within
    * its partition, never globally). Undecodable payloads surface as
    * `decoded = false, n_frames = -1, cuts = -1`. */
  def sceneCuts(media: DataFrame, threshold: Double = 16.0)
      (implicit spark: SparkSession): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("media_id").orderBy("frame_idx")
    decodeVideoFrames(media).toDF()
      .withColumn("prev", lag(col("mean_luma"), 1).over(w))
      .withColumn("cut",
        when(col("decoded") && col("prev").isNotNull &&
          abs(col("mean_luma") - col("prev")) > threshold, 1L).otherwise(0L))
      .groupBy("media_id")
      .agg(first(col("decoded")).as("decoded"), // uniform within a video
        count(lit(1)).as("nf"), sum(col("cut")).as("sc"))
      .select(col("media_id"), col("decoded"),
        when(col("decoded"), col("nf")).otherwise(lit(-1L)).as("n_frames"),
        when(col("decoded"), col("sc")).otherwise(lit(-1L)).as("cuts"))
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
        // in-memory payloads: ImageIO's default disk cache writes a temp
        // file per decoded stream — pure overhead here, and temp-dir churn
        // under 32 concurrent decode tasks
        javax.imageio.ImageIO.setUseCache(false)
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
