package graft.tools

import graft.operators.Multimodal

/** Per-row decode-budget isolation for the real audio codec path
  * (VERDICT r12 item 6): single-threaded tight loops over the SAME
  * fixture payloads mm07/mm08 decode, timing
  *
  *   - encode      — fixture WAV container build (excluded from both)
  *   - full decode — [[Multimodal.WavDecoder]]: header + full PCM fold
  *   - header only — [[Multimodal.WavHeaderDecoder]]: RIFF/fmt parse
  *
  * so the mm07 SCALING reading decomposes into real per-row codec work
  * vs host jitter, and the mm08 fast path's saving is a committed
  * number instead of a claim. No Spark session — this is a pure JVM
  * microbenchmark of the kernel the executors run per row.
  *
  *   sbt "runMain graft.tools.AudioBudget [nRows] [reps]"
  */
object AudioBudget {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(20000)
    val reps = args.lift(1).map(_.toInt).getOrElse(3)

    val ids = (0L until n.toLong).toArray
    val payloads = ids.map(Multimodal.MediaFixtures.wavBytes)
    val bytesTotal = payloads.map(_.length.toLong).sum

    def time(fn: => Unit): Double = { val t0 = System.nanoTime(); fn; (System.nanoTime() - t0) / 1e9 }
    // one warmup rep JITs both decoders before anything is measured
    var sink = 0L
    def fullPass(): Unit = {
      var i = 0
      while (i < n) { sink ^= Multimodal.WavDecoder.decode(ids(i), payloads(i)).pcm_checksum; i += 1 }
    }
    def headerPass(): Unit = {
      var i = 0
      while (i < n) { sink ^= Multimodal.WavHeaderDecoder.decode(ids(i), payloads(i)).n_samples; i += 1 }
    }
    fullPass(); headerPass()

    val full = (1 to reps).map(_ => time(fullPass())).min
    val header = (1 to reps).map(_ => time(headerPass())).min
    def f(v: Double) = "%.4f".formatLocal(java.util.Locale.ROOT, v)
    println(s"""{"metric":"audio_decode_budget","n_rows":$n,"reps":$reps,""" +
      s""""payload_mb":${f(bytesTotal / 1048576.0)},""" +
      s""""full_us_per_row":${f(full * 1e6 / n)},"header_us_per_row":${f(header * 1e6 / n)},""" +
      s""""full_mb_per_s":${f(bytesTotal / 1048576.0 / full)},""" +
      s""""speedup":${f(full / header)},"sink":$sink}""")
  }
}
