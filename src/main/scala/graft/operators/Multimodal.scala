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
  * The actual codec is STUBBED — this container has no image/audio
  * libraries — behind [[MediaDecoder]]; [[StubDecoder]] produces
  * deterministic fake features from the bytes. The Spark-side
  * contract (schema, partitioning, batch iteration, frame explode) is
  * real and tested; swapping in a JNI/ffmpeg decoder is a one-class
  * change.
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
  ): DataFrame = {
    val sk = df
      .select(col(idCol).as("id"),
        graft.functions.Sketches.pHash63Col(col(payloadCol)).as("h"))
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
