package graft.tools

import java.nio.file.Files

import graft.Sessions
import graft.ingest.GenericImporter
import graft.model._
import graft.registry.DatasetRegistry

/** BASELINE.md B1 measurement: a ~10 MB CSV through the full generic
  * import path (discover → register → normalize → stamp → append →
  * archive). Target: < 30 s end-to-end.
  * `sbt "runMain graft.tools.ImportBench [mb]"`.
  */
object ImportBench {
  def main(args: Array[String]): Unit = {
    val targetMb = args.headOption.map(_.toInt).getOrElse(10)
    val spark = Sessions.local(cores = 8, app = "graft-import-bench")
    val root = Files.createTempDirectory("graft-ib")
    val src = Files.createDirectories(root.resolve("file_watcher"))
    val arch = Files.createDirectories(root.resolve("archive"))

    // ~100-byte rows → ~10k rows per MB; FIXTURES.md F1 shape
    val rows = targetMb * 10000
    val sb = new StringBuilder(targetMb * 1100000)
    sb ++= "EventID,URL,IfExists,InvalidEventID,IsDownloadable,DownloadLink,StatusCode,Title\n"
    var i = 0
    while (i < rows) {
      sb ++= s"$i,https://www.example.com/sched/event_$i/__co-list_cp.html,1,False,1,"
      sb ++= s"https://www.example.com/sched/event_$i/__co-list_cp.xls?event_id=$i,200,Conference $i\n"
      i += 1
    }
    val f = src.resolve("20250401T120000_MeetMaxURLCheck.csv")
    Files.write(f, sb.toString.getBytes("UTF-8"))
    val mb = Files.size(f) / 1e6
    val cfg = ImportConfig(
      1, "B1", "MeetMax", "MeetMaxURL", src.toString, arch.toString,
      """\d{8}T\d{6}_MeetMaxURLCheck\.csv""", "CSV",
      MetaSource.Static, Some("MeetMaxURLCheck"),
      MetaSource.Filename, Some("0"), Some("yyyyMMdd'T'HHmmss"), Some("_"),
      "public.tmeetmaxurlcheck", ImportStrategy.Evolve, isActive = true)
    val reg = new DatasetRegistry(spark, s"$root/registry")
    val imp = new GenericImporter(spark, reg, s"$root/warehouse")

    val t0 = System.nanoTime()
    val res = imp.run(cfg, typeId = 2, sourceId = 1)
    val sec = (System.nanoTime() - t0) / 1e9
    val readBack = imp.readTarget("public.tmeetmaxurlcheck").count()
    println(f"[import-bench] ${mb}%.1f MB, ${res.loadedRows} rows loaded in $sec%.2f s " +
      s"(readback $readBack rows) — B1 target < 30 s: ${if (sec < 30) "MET" else "MISSED"}")
    spark.stop()
  }
}
