package graft

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

import javax.imageio.ImageIO

import org.apache.spark.sql.functions._

import graft.operators.Multimodal

/** The REAL decode path of the multimodal family: [[Multimodal
  * .ImageIODecoder]] over genuine PNG/JPEG/BMP bytes produced by the
  * JDK encoder itself, plus the pixel-aHash near-dup join over real
  * decoded rasters. mm02/mm03 stay on the stub/byte path because the
  * DuckDB oracle can replay a byte fold but not an IDCT — this spec is
  * where the decoder meets actual images.
  */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  /** Deterministic test image: a per-seed gradient + blocks pattern. */
  private def makeImage(w: Int, h: Int, seed: Int): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val r = (x * 255 / math.max(1, w - 1) + seed * 37) % 256
      val g = (y * 255 / math.max(1, h - 1) + seed * 73) % 256
      val b = ((x + y + seed) * 11) % 256
      img.setRGB(x, y, (r << 16) | (g << 8) | b)
    }
    img
  }

  private def encode(img: BufferedImage, fmt: String): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    assert(ImageIO.write(img, fmt, out), s"JDK must encode $fmt")
    out.toByteArray
  }

  /** Flip a few pixels — a near-duplicate that survives re-hash. */
  private def noised(img: BufferedImage, seed: Int): BufferedImage = {
    val c = new BufferedImage(img.getWidth, img.getHeight, BufferedImage.TYPE_INT_RGB)
    val g = c.getGraphics; g.drawImage(img, 0, 0, null); g.dispose()
    for (i <- 0 until 3) {
      val x = (seed * 31 + i * 97) % img.getWidth
      val y = (seed * 17 + i * 53) % img.getHeight
      c.setRGB(x, y, c.getRGB(x, y) ^ 0x010101)
    }
    c
  }

  test("ImageIODecoder extracts real dimensions, mime, and pixel checksum") {
    val png = encode(makeImage(40, 24, seed = 1), "png")
    val jpg = encode(makeImage(32, 48, seed = 2), "jpg")
    val bmp = encode(makeImage(16, 16, seed = 3), "bmp")
    val junk = Array.tabulate[Byte](64)(i => (i * 7 + 3).toByte)
    val media = Seq(
      (1L, png), (2L, jpg), (3L, bmp), (4L, junk)
    ).toDF("media_id", "payload")
    val feats = Multimodal.decodeFeatures(media, new Multimodal.ImageIODecoder)
      .collect().map(f => f.media_id -> f).toMap
    assert(feats(1L).mime == "image/png" && feats(1L).width == 40 && feats(1L).height == 24)
    assert(feats(1L).n_frames == 1 && feats(1L).n_bytes == png.length)
    assert(feats(2L).mime == "image/jpeg" && feats(2L).width == 32 && feats(2L).height == 48)
    assert(feats(3L).mime == "image/bmp" && feats(3L).width == 16 && feats(3L).height == 16)
    // undecodable bytes degrade, never crash
    assert(feats(4L).mime == "application/octet-stream" && feats(4L).width == 0
      && feats(4L).n_frames == 0)
    // checksum is over DECODED PIXELS: a lossless re-encode of the same
    // raster (PNG → BMP) collides even though the bytes differ
    val pngAsBmp = encode(ImageIO.read(new java.io.ByteArrayInputStream(png)), "bmp")
    assert(!java.util.Arrays.equals(png, pngAsBmp))
    val re = Multimodal.decodeFeatures(
      Seq((9L, pngAsBmp)).toDF("media_id", "payload"),
      new Multimodal.ImageIODecoder).collect().head
    assert(re.checksum == feats(1L).checksum,
      "pixel-level checksum must see through the container format")
    assert(re.checksum != feats(2L).checksum)
  }

  test("imagePhashPairs finds noised/re-encoded near-dups over real pixels and is partition-invariant") {
    // 8 distinct base images; bases 0 and 1 get near-dup variants
    // (pixel noise and a lossless re-encode), the rest stay singletons
    val bases = (0 until 8).map(s => makeImage(36, 28, seed = s * 5 + 1))
    val rows = Seq.newBuilder[(Long, Array[Byte])]
    bases.zipWithIndex.foreach { case (img, i) => rows += ((i.toLong, encode(img, "png"))) }
    rows += ((100L, encode(noised(bases(0), seed = 4), "png")))
    rows += ((101L, encode(bases(1), "bmp"))) // byte-distinct, pixel-identical
    rows += ((102L, Array.tabulate[Byte](50)(i => (i * 13).toByte))) // undecodable
    val media = rows.result().toDF("media_id", "payload")
    val pairs = Multimodal.imagePhashPairs(media, maxHamming = 12)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sorted.toSeq
    assert(pairs.exists(p => p._1 == 0L && p._2 == 100L && p._3 <= 12),
      s"noised copy must band-collide and verify: $pairs")
    assert(pairs.exists(p => p._1 == 1L && p._2 == 101L && p._3 == 0),
      s"pixel-identical re-encode must be hamming 0: $pairs")
    assert(!pairs.exists(p => p._1 == 102L || p._2 == 102L),
      "undecodable payloads have no pixels to pair")
    val repart = Multimodal.imagePhashPairs(media.repartition(7), maxHamming = 12)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sorted.toSeq
    assert(repart == pairs, "hashes are per-row pure -> pairs partition-invariant")
  }

  test("decodeImageFacts round-trips MediaFixtures content exactly (PNG and BMP)") {
    import graft.operators.Multimodal.MediaFixtures
    val ids = Seq(0L, 1L, 2L, 7L, 40L) // both parities -> both codecs
    val media = ids.map(id => (id, MediaFixtures.imageBytes(id)))
      .toDF("media_id", "payload")
    val facts = Multimodal.decodeImageFacts(media)
      .collect().map(f => f.media_id -> f).toMap
    ids.foreach { id =>
      val f = facts(id)
      assert(f.mime == (if (id % 2 == 0) "image/png" else "image/bmp"))
      assert(f.width == MediaFixtures.imgW(id) && f.height == MediaFixtures.imgH(id))
      assert(f.n_frames == 1)
      // lossless codecs: decoded pixels == synthesized pixels, so the
      // fold recomputed here locally must equal the decoder's
      var h = 1469598103934665603L
      for (y <- 0 until f.height; x <- 0 until f.width)
        h = h * 1000003L + (MediaFixtures.rgb(id, x, y) & 0xffffffffL)
      assert(f.pixel_checksum == h, s"pixel fold mismatch for id=$id")
    }
    // junk quarantines instead of crashing
    val junk = Seq((9L, Array.tabulate[Byte](20)(i => (i * 7).toByte)))
      .toDF("media_id", "payload")
    val q = Multimodal.decodeImageFacts(junk).collect().head
    assert(q.mime == "application/octet-stream" && q.width == 0 && q.ahash == 0L)
  }

  test("WavDecoder parses real JDK-written WAV bytes exactly") {
    import graft.operators.Multimodal.{MediaFixtures, WavDecoder}
    val ids = Seq(0L, 1L, 2L, 5L, 301L) // all three sample rates
    ids.foreach { id =>
      val f = WavDecoder.decode(id, MediaFixtures.wavBytes(id))
      assert(f.mime == "audio/wav" && f.channels == 1 && f.bits == 16)
      assert(f.sample_rate == MediaFixtures.wavRate(id))
      assert(f.n_samples == MediaFixtures.wavFrames(id).toLong)
      assert(f.duration_ms == f.n_samples * 1000L / f.sample_rate)
      // WAV is lossless: recompute the sample fold from the arithmetic
      var h = 1469598103934665603L
      (0 until MediaFixtures.wavFrames(id)).foreach { i =>
        h = h * 1000003L + (MediaFixtures.pcmSample(id, i) & 0xffffL)
      }
      assert(f.pcm_checksum == h, s"pcm fold mismatch for id=$id")
    }
    // identical PCM written into a fresh container collides on the
    // content checksum (the dedup property the fingerprint exists for)
    val a = WavDecoder.decode(3L, MediaFixtures.wavBytes(3L))
    val b = WavDecoder.decode(99L, MediaFixtures.wavBytes(3L))
    assert(a.pcm_checksum == b.pcm_checksum && a.energy_hash == b.energy_hash)
    // junk and truncated containers quarantine
    val junk = WavDecoder.decode(9L, Array.tabulate[Byte](30)(i => (i * 3).toByte))
    assert(junk.mime == "application/octet-stream" && junk.n_samples == 0L)
    val truncated = MediaFixtures.wavBytes(4L).take(10)
    assert(WavDecoder.decode(4L, truncated).mime == "application/octet-stream")
  }

  test("WavHeaderDecoder agrees with the full decoder on every header fact") {
    import graft.operators.Multimodal.{MediaFixtures, WavDecoder, WavHeaderDecoder}
    (0L until 40L).foreach { id =>
      val bytes = MediaFixtures.wavBytes(id)
      val full = WavDecoder.decode(id, bytes)
      val hdr = WavHeaderDecoder.decode(id, bytes)
      assert((hdr.mime, hdr.sample_rate, hdr.channels, hdr.bits, hdr.n_samples,
        hdr.duration_ms) ==
        (full.mime, full.sample_rate, full.channels, full.bits, full.n_samples,
          full.duration_ms), s"header/full drift for id=$id")
    }
    // same quarantine contract as the full decoder
    val junk = WavHeaderDecoder.decode(9L, Array.tabulate[Byte](30)(i => (i * 3).toByte))
    assert(junk.mime == "application/octet-stream" && junk.n_samples == 0L)
    val truncated = MediaFixtures.wavBytes(4L).take(10)
    assert(WavHeaderDecoder.decode(4L, truncated).mime == "application/octet-stream")
    // a data chunk cut mid-run caps n at what is actually present
    val cut = MediaFixtures.wavBytes(6L)
    val short = cut.take(cut.length - 20)
    val h = WavHeaderDecoder.decode(6L, short)
    assert(h.mime == "audio/wav" && h.n_samples == MediaFixtures.wavFrames(6L) - 10L)
  }

  test("decodeAudioFacts is partition-invariant") {
    import graft.operators.Multimodal.MediaFixtures
    val media = (0L until 12L).map(id => (id, MediaFixtures.wavBytes(id)))
      .toDF("media_id", "payload")
    val a = Multimodal.decodeAudioFacts(media).collect().sortBy(_.media_id).toSeq
    val b = Multimodal.decodeAudioFacts(media.repartition(7))
      .collect().sortBy(_.media_id).toSeq
    assert(a == b)
  }

  test("mm02 stub path is unchanged by the real decoder's existence") {
    // the oracle-replayable row keeps the stub contract: byte-derived
    // features, bit-stable under partitioning
    val docs = Seq((1L, "hello world abc"), (2L, ""), (3L, "xyz")).toDF("doc_id", "text")
    val media = Multimodal.asMediaBatch(docs, "doc_id", "text")
    val a = Multimodal.decodeFeatures(media, new Multimodal.StubDecoder)
      .collect().sortBy(_.media_id).toSeq
    val b = Multimodal.decodeFeatures(
      Multimodal.asMediaBatch(docs.repartition(5), "doc_id", "text"),
      new Multimodal.StubDecoder).collect().sortBy(_.media_id).toSeq
    assert(a == b)
    assert(a.head.mime == "image/png") // 15 bytes % 3 == 0
  }
}
