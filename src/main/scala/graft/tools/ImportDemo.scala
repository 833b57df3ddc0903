package graft.tools

import java.nio.file.Files

import graft.Sessions
import graft.ingest.GenericImporter
import graft.model._
import graft.registry.DatasetRegistry

/** CLI demo of the core ingestion path: lands a FIXTURES.md F1-shaped
  * CSV in a watch directory, runs the generic importer twice (same
  * label+date → version displacement), and prints the registry and the
  * version-pruned read. `sbt "runMain graft.tools.ImportDemo"`.
  */
object ImportDemo {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(cores = 8, app = "graft-import-demo")
    val root = Files.createTempDirectory("graft-demo")
    val src = Files.createDirectories(root.resolve("file_watcher"))
    val arch = Files.createDirectories(root.resolve("archive"))
    val reg = new DatasetRegistry(spark, s"$root/registry")
    val imp = new GenericImporter(spark, reg, s"$root/warehouse")

    val csv =
      """EventID,URL,IfExists,InvalidEventID,IsDownloadable,DownloadLink,StatusCode,Title
        |119179,https://x/event_119179,1,False,1,https://x/119179.xls,200,Conf A
        |119180,https://x/event_119180,1,False,0,,200,Conf B
        |""".stripMargin
    val seed = ImportConfig(
      configId = 1, configName = "MeetMaxURLCheckImport",
      datasource = "MeetMax", datasettype = "MeetMaxURL",
      sourceDirectory = src.toString, archiveDirectory = arch.toString,
      filePattern = """\d{8}T\d{6}_MeetMaxURLCheck\.csv""",
      fileType = "CSV",
      labelSource = MetaSource.Static, labelLocation = Some("MeetMaxURLCheck"),
      dateSource = MetaSource.Filename, dateLocation = Some("0"),
      dateFormat = Some("yyyyMMdd'T'HHmmss"), delimiter = Some("_"),
      targetTable = "public.tmeetmaxurlcheck",
      strategy = ImportStrategy.Evolve, isActive = true
    )
    // config rows ARE the API: seed the config table, then run from it
    val store = new graft.ingest.ConfigStore(spark, s"$root/configs")
    store.upsert(Seq(seed))
    val cfg = store.get(1).get
    println(s"[demo] loaded config '${cfg.configName}' from the config table")

    Files.write(src.resolve("20250401T120000_MeetMaxURLCheck.csv"), csv.getBytes)
    val r1 = imp.run(cfg, typeId = 2, sourceId = 1)
    println(s"[demo] first import: ${r1.files}")
    Files.write(src.resolve("20250401T170000_MeetMaxURLCheck.csv"), csv.getBytes)
    val r2 = imp.run(cfg, typeId = 2, sourceId = 1)
    println(s"[demo] second import (same label+date): ${r2.files}")

    println("[demo] registry:")
    reg.load().orderBy("datasetid").show(truncate = false)
    val facts = imp.readTarget("public.tmeetmaxurlcheck")
    println(s"[demo] fact rows total (append-only): ${facts.count()}")
    val pruned = reg.latestActiveFacts(facts, 2)
    println(s"[demo] latest-active pruned rows: ${pruned.count()}")
    pruned.show(truncate = false)
    println("[demo] pruned plan (expect datasetid isin-filter pushed to scan):")
    pruned.explain("formatted")
    spark.stop()
  }
}
