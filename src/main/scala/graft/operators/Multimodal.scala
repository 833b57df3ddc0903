package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing for training-data pipelines: media
  * payloads travel as opaque `binary` columns with typed metadata
  * structs; decode / feature-extraction runs partition-wise so one
  * decoder instance amortizes over a whole batch of rows (the same
  * batch shape `mapInPandas`/Arrow gives Python pipelines).
  *
  * Two codecs behind the [[MediaDecoder]] seam:
  *   - [[ImageIODecoder]] — a REAL JDK-only image decoder
  *     (`javax.imageio`: PNG, JPEG, GIF, BMP): mime sniffed from magic
  *     bytes, dimensions and frame count from the decoded stream,
  *     checksum folded over the decoded ARGB pixels, and a 63-bit
  *     average-hash over a 9×7 luma grid ([[pixelAHash63]]) that feeds
  *     the same banded near-dup join as the byte-level pHash;
  *   - [[StubDecoder]] — deterministic fake features from the raw
  *     bytes, kept as the ORACLE-REPLAYABLE path (DuckDB can replay a
  *     byte fold; it cannot replay an IDCT): mm02's row pins the
  *     partition-wise plumbing bit-for-bit through the stub while
  *     MultimodalSpec drives the real decoder over real PNG/JPEG/BMP
  *     bytes.
  * Audio/video stay stubbed — those codecs are not in the JDK.
  */
object Multimodal {

  /** Decoded-media feature record. */
  final case class MediaFeatures(
      media_id: Long,
      mime: String,
      n_bytes: Long,
      width: Int,
      height: Int,
      n_frames: Int,
      checksum: Long
  )

  /** The decode seam. Implementations must be Serializable (instances
    * are constructed per partition on executors).
    */
  trait MediaDecoder extends Serializable {
    def decode(id: Long, bytes: Array[Byte]): MediaFeatures
  }

  /** Deterministic fake decode: dimensions and frame counts derived
    * from the payload bytes. Replace with a real codec off-container.
    */
  final class StubDecoder extends MediaDecoder {
    def decode(id: Long, bytes: Array[Byte]): MediaFeatures = {
      var h = 1469598103934665603L
      var i = 0
      while (i < bytes.length) { h = h * 1000003L + (bytes(i) & 0xffL); i += 1 }
      val mime =
        if (bytes.length % 3 == 0) "image/png"
        else if (bytes.length % 3 == 1) "audio/wav"
        else "video/mp4"
      MediaFeatures(
        media_id = id,
        mime = mime,
        n_bytes = bytes.length.toLong,
        width = 16 + math.floorMod(h, 1024).toInt,
        height = 16 + math.floorMod(h >>> 10, 1024).toInt,
        n_frames = 1 + math.floorMod(h >>> 20, 64).toInt,
        checksum = h
      )
    }
  }

  /** Magic-byte mime sniff for the JDK-decodable image formats. */
  private[operators] def sniffImageMime(b: Array[Byte]): Option[String] =
    if (b.length >= 8 && (b(0) & 0xff) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G')
      Some("image/png")
    else if (b.length >= 3 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8 &&
      (b(2) & 0xff) == 0xff)
      Some("image/jpeg")
    else if (b.length >= 6 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8')
      Some("image/gif")
    else if (b.length >= 2 && b(0) == 'B' && b(1) == 'M')
      Some("image/bmp")
    else None

  private def byteFnv(bytes: Array[Byte]): Long = {
    var h = 1469598103934665603L
    var i = 0
    while (i < bytes.length) { h = h * 1000003L + (bytes(i) & 0xffL); i += 1 }
    h
  }

  /** Real JDK-only image decode (`javax.imageio`): PNG/JPEG/GIF/BMP.
    * Dimensions come from the decoded first frame, `n_frames` from the
    * reader's image count (animated GIFs > 1), and the checksum folds
    * the decoded ARGB pixels (so two byte-distinct encodings of the
    * same pixels collide — the property the dedup family wants from a
    * decode-level fingerprint). Bytes that fail the sniff or the
    * decode degrade to `application/octet-stream` with zero dimensions
    * and the byte-fold checksum — a curation pipeline quarantines
    * them, it does not crash. One decoder instance per partition
    * ([[decodeFeatures]]); `ImageIO` file caching is disabled so
    * decode never touches executor-local disk.
    */
  final class ImageIODecoder extends MediaDecoder {
    def decode(id: Long, bytes: Array[Byte]): MediaFeatures = {
      val mime = sniffImageMime(bytes)
      val img = mime.flatMap(_ => ImageIODecoder.readImage(bytes))
      (mime, img) match {
        case (Some(m), Some((bi, nFrames))) =>
          MediaFeatures(id, m, bytes.length.toLong,
            bi.getWidth, bi.getHeight, nFrames, ImageIODecoder.pixelFnv(bi))
        case _ =>
          MediaFeatures(id, "application/octet-stream", bytes.length.toLong,
            0, 0, 0, byteFnv(bytes))
      }
    }
  }

  object ImageIODecoder {
    javax.imageio.ImageIO.setUseCache(false)

    /** Decode the first frame + count frames; None when undecodable. */
    private[operators] def readImage(
        bytes: Array[Byte]): Option[(java.awt.image.BufferedImage, Int)] = {
      val in = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(in)
        if (!readers.hasNext) return None
        val r = readers.next()
        try {
          r.setInput(in)
          val img = r.read(0)
          val n =
            try math.max(1, r.getNumImages(true))
            catch { case _: Exception => 1 }
          Some((img, n))
        } finally r.dispose()
      } catch {
        case _: Exception => None
      } finally in.close()
    }

    /** FNV-style fold over the decoded ARGB raster, row-major. */
    private[operators] def pixelFnv(bi: java.awt.image.BufferedImage): Long = {
      var h = 1469598103934665603L
      var y = 0
      while (y < bi.getHeight) {
        var x = 0
        while (x < bi.getWidth) {
          h = h * 1000003L + (bi.getRGB(x, y) & 0xffffffffL)
          x += 1
        }
        y += 1
      }
      h
    }

    /** 63-bit average-hash over REAL PIXELS: a 9×7 grid of luma
      * samples (integer BT.601 weights), bit j set iff
      * `luma_j × 63 > Σ luma` — the same above-mean rule as the
      * byte-level [[graft.functions.Sketches.PHash63Expr]], so the
      * downstream banded join is shared verbatim. Near-identical
      * images (re-encode, small noise) agree on most grid bits;
      * unrelated images do not.
      */
    private[operators] def pixelAHash63(bi: java.awt.image.BufferedImage): Long = {
      val w = bi.getWidth
      val h = bi.getHeight
      val luma = new Array[Long](63)
      var sum = 0L
      var j = 0
      while (j < 63) {
        val x = if (w == 1) 0 else ((j % 9) * (w - 1)) / 8
        val y = if (h == 1) 0 else ((j / 9) * (h - 1)) / 6
        val rgb = bi.getRGB(x, y)
        val l = (299L * ((rgb >> 16) & 0xff) + 587L * ((rgb >> 8) & 0xff) +
          114L * (rgb & 0xff)) / 1000L
        luma(j) = l
        sum += l
        j += 1
      }
      var code = 0L
      j = 0
      while (j < 63) {
        if (luma(j) * 63 > sum) code |= (1L << j)
        j += 1
      }
      code
    }
  }

  /** Wrap a text/id frame into the canonical media-batch shape:
    * (media_id long, payload binary). Stands in for reading real blobs
    * (parquet binary columns / tar shards).
    */
  def asMediaBatch(df: DataFrame, idCol: String, payloadCol: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      col(payloadCol).cast("binary").as("payload")
    )

  /** Partition-wise decode: one decoder per partition, streamed row
    * iteration (no per-row setup, no collect). Returns a typed
    * Dataset; downstream joins/filters stay columnar.
    */
  def decodeFeatures(
      media: DataFrame,
      decoder: MediaDecoder
  ): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media
      .select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // decoder is reused across the whole partition — the expensive
        // codec init happens once per task, not once per row
        rows.map { case (id, bytes) => decoder.decode(id, bytes) }
      }
  }

  /** Frame sampling: explode a payload into fixed-size chunk "frames"
    * with indices — the plumbing shape of video frame extraction
    * (real decoder would emit JPEG frames instead of byte slices).
    */
  def sampleFrames(media: DataFrame, frameBytes: Int, everyNth: Int = 1): DataFrame =
    media
      .withColumn("n_bytes", length(col("payload")).cast("long"))
      // empty payloads yield zero frames — without the filter,
      // sequence(0, -1) auto-negates its step and yields [0, -1]
      .filter(col("n_bytes") > 0)
      .withColumn(
        "frame_idx",
        explode(sequence(lit(0), ceil(col("n_bytes") / frameBytes).cast("int") - 1))
      )
      .filter(pmod(col("frame_idx"), lit(everyNth)) === 0)
      .withColumn("frame", expr(s"substring(payload, frame_idx * $frameBytes + 1, $frameBytes)"))
      .select("media_id", "frame_idx", "frame")

  /** Perceptual-hash near-dup detection over media payloads: 63-bit
    * aHash per payload (`functions.Sketches.PHash63Expr` — one pass,
    * no float mean), then the Manku banded join: candidates collide
    * on one of four 16-bit bands, verified by exact hamming distance.
    * The same scale shape as the SimHash text pairs — the shuffle
    * carries one long per payload, never the payload itself.
    */
  def phashPairs(
      df: DataFrame,
      idCol: String,
      payloadCol: String,
      maxHamming: Int = 12
  ): DataFrame =
    phashPairsFromHashes(
      df.select(col(idCol).as("id"),
        graft.functions.Sketches.pHash63Col(col(payloadCol)).as("h")),
      maxHamming)

  /** Perceptual near-dup over REAL DECODED PIXELS: partition-wise
    * [[ImageIODecoder]] decode → [[ImageIODecoder.pixelAHash63]] luma
    * grid hash → the same Manku banded join as [[phashPairs]].
    * Undecodable payloads drop out (they have no pixels to compare;
    * [[decodeFeatures]] is where they surface for quarantine). Byte-
    * identical copies, re-encodes and lightly-noised variants collide;
    * the shuffle carries one long per image, never pixels or payloads.
    */
  def imagePhashPairs(media: DataFrame, maxHamming: Int = 12): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    val hashes = media
      .select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, bytes) =>
          sniffImageMime(bytes).flatMap(_ => ImageIODecoder.readImage(bytes))
            .map { case (bi, _) => (id, ImageIODecoder.pixelAHash63(bi)) }
        }
      }
      .toDF("id", "h")
    phashPairsFromHashes(hashes, maxHamming)
  }

  /** The shared banded-join tail: candidates collide on one of four
    * 16-bit bands of a 63-bit hash, verified by exact hamming.
    */
  private def phashPairsFromHashes(hashes: DataFrame, maxHamming: Int): DataFrame = {
    val sk = hashes
      .localCheckpoint() // consumed by the band explode AND both verify lookups
    val banded = sk.select(
      col("id"),
      explode(array((0 until 4).map { b =>
        struct(lit(b).as("band_idx"),
          (shiftright(col("h"), 16 * b).bitwiseAND(lit(0xffffL))).as("band_key"))
      }: _*)).as("band"))
      .select(col("id"), col("band.band_idx"), col("band.band_key"))
    val cand = banded.alias("a")
      .join(banded.alias("b"),
        col("a.band_idx") === col("b.band_idx") &&
          col("a.band_key") === col("b.band_key") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
    cand
      .join(sk.select(col("id").as("id_a"), col("h").as("h_a")), "id_a")
      .join(sk.select(col("id").as("id_b"), col("h").as("h_b")), "id_b")
      .select(col("id_a"), col("id_b"),
        bit_count(col("h_a").bitwiseXOR(col("h_b"))).cast("int").as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }
}
