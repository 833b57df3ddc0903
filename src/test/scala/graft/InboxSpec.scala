package graft

import java.nio.file.{Files, Path}
import java.time.LocalDate

import scala.collection.mutable

import org.apache.spark.sql.functions._

import graft.ingest._
import graft.model._
import graft.registry.DatasetRegistry

/** S7 connector state machine (gmail_inbox_processor.py:67-196)
  * against an in-memory mailbox: match / no-match / error branches,
  * date-prefixed saves, Processed/ErrorFolder relabeling, and the
  * landed attachment flowing into the generic importer.
  */
class InboxSpec extends SparkSpec {

  private val today = LocalDate.of(2026, 8, 12)

  private final class FakeInbox(msgs: Seq[MailMessage], failFetch: Set[String] = Set.empty)
      extends InboxService {
    val labels = mutable.Map.empty[String, String] // msgId -> current label
    msgs.foreach(m => labels(m.id) = "INBOX")
    def listInbox(): Seq[String] = msgs.map(_.id)
    def fetch(id: String): MailMessage =
      if (failFetch(id)) throw new RuntimeException(s"boom $id")
      else msgs.find(_.id == id).get
    def relabel(id: String, removeLabel: String, addLabel: String): Unit = {
      assert(labels(id) == removeLabel, s"$id relabeled from wrong state ${labels(id)}")
      labels(id) = addLabel
    }
  }

  private def cfg(dir: Path, id: Int = 1,
      subject: Option[String] = Some("Daily Exception Report"),
      hasAtt: Boolean = true,
      attPattern: Option[String] = Some(""".*\.csv""")) =
    InboxConfig(id, s"cfg$id", "etl@example.com", subject, hasAtt, attPattern, dir.toString)

  private def msg(id: String, subject: String, date: Option[String],
      atts: (String, String)*) =
    MailMessage(id, subject, date,
      atts.map { case (n, d) => MailAttachment(n, d.getBytes("UTF-8")) },
      s"raw-$id".getBytes("UTF-8"))

  test("match branch: date-prefixed .eml + matching attachments saved, relabeled Processed") {
    val dir = Files.createTempDirectory("graft-inbox")
    val m = msg("m1", "Re: Yost - Daily Exception Report attached",
      Some("Tue, 01 Apr 2025 09:30:00 +0000"),
      "report.csv" -> "EventID,Title\n1,A\n", "logo.png" -> "PNG")
    val svc = new FakeInbox(Seq(m))
    val results = new InboxProcessor(svc, () => today).run(Seq(cfg(dir)))
    assert(results.map(_.outcome) == Seq(InboxOutcome.Processed))
    assert(results.head.configId.contains(1))
    // sent-date prefix, .eml + ONLY the pattern-matching attachment
    val names = results.head.savedFiles.map(_.getFileName.toString)
    assert(names == Seq("20250401_m1.eml", "20250401_report.csv"))
    assert(Files.exists(dir.resolve("20250401_report.csv")))
    assert(!Files.exists(dir.resolve("20250401_logo.png")))
    assert(svc.labels("m1") == "Processed")
    // subject search is case-insensitive and anywhere-in-string
    assert(new InboxProcessor(svc, () => today)
      .matches(cfg(dir, subject = Some("daily exception report")), m))
  }

  test("unparseable date header falls back to today's prefix") {
    val dir = Files.createTempDirectory("graft-inbox")
    val svc = new FakeInbox(Seq(
      msg("m2", "Daily Exception Report", Some("not a date"), "x.csv" -> "a\n1\n")))
    val results = new InboxProcessor(svc, () => today).run(Seq(cfg(dir)))
    assert(results.head.savedFiles.map(_.getFileName.toString) ==
      Seq("20260812_m2.eml", "20260812_x.csv"))
  }

  test("hostile attachment names are confined to the repository dir; collisions get suffixes") {
    val dir = Files.createTempDirectory("graft-inbox")
    val evil = msg("m9", "Daily Exception Report", Some("Tue, 01 Apr 2025 09:30:00 +0000"),
      "../../escape.csv" -> "a\n1\n")
    val svc = new FakeInbox(Seq(evil))
    val results = new InboxProcessor(svc, () => today).run(Seq(cfg(dir)))
    assert(results.map(_.outcome) == Seq(InboxOutcome.Processed))
    // the traversal components are stripped: the file lands INSIDE dir
    assert(results.head.savedFiles.forall(_.normalize.startsWith(dir.normalize)))
    assert(Files.exists(dir.resolve("20250401_escape.csv")))
    assert(!Files.exists(dir.getParent.resolve("escape.csv")))
    // same-day same-name from a SECOND message must not clobber the first
    val twin = msg("m10", "Daily Exception Report", Some("Tue, 01 Apr 2025 10:00:00 +0000"),
      "escape.csv" -> "a\n2\n")
    val results2 = new InboxProcessor(new FakeInbox(Seq(twin)), () => today).run(Seq(cfg(dir)))
    val att2 = results2.head.savedFiles.find(_.getFileName.toString.endsWith(".csv")).get
    assert(att2.getFileName.toString == "20250401_escape_1.csv")
    assert(new String(Files.readAllBytes(dir.resolve("20250401_escape.csv")), "UTF-8") == "a\n1\n",
      "original must be untouched")
  }

  test("no-match branches relabel to ErrorFolder and save nothing") {
    val dir = Files.createTempDirectory("graft-inbox")
    val wrongSubject = msg("m3", "Lunch menu", None, "r.csv" -> "a\n1\n")
    val noAttachment = msg("m4", "Daily Exception Report", None)
    val wrongAttName = msg("m5", "Daily Exception Report", None, "r.pdf" -> "PDF")
    val svc = new FakeInbox(Seq(wrongSubject, noAttachment, wrongAttName))
    val results = new InboxProcessor(svc, () => today).run(Seq(cfg(dir)))
    assert(results.forall(r => r.outcome == InboxOutcome.NoMatch && r.savedFiles.isEmpty))
    assert(Seq("m3", "m4", "m5").forall(svc.labels(_) == "ErrorFolder"))
    assert(!Files.list(dir).iterator().hasNext)
  }

  test("first matching active config wins; inactive configs are skipped") {
    val dirA = Files.createTempDirectory("graft-inbox-a")
    val dirB = Files.createTempDirectory("graft-inbox-b")
    val m = msg("m6", "Daily Exception Report", None, "r.csv" -> "a\n1\n")
    val svc = new FakeInbox(Seq(m))
    val inactive = cfg(dirA, id = 7).copy(isActive = false)
    val results = new InboxProcessor(svc, () => today)
      .run(Seq(inactive, cfg(dirA, id = 2), cfg(dirB, id = 3)))
    assert(results.head.configId.contains(2))
    assert(Files.exists(dirA.resolve("20260812_r.csv")))
    assert(!Files.exists(dirB.resolve("20260812_r.csv")))
    // no-attachment-filter config: any attachment matches (":99-103")
    assert(new InboxProcessor(svc, () => today)
      .matches(cfg(dirA, attPattern = None), m))
  }

  test("fetch failure relabels to ErrorFolder best-effort and reports Error") {
    val dir = Files.createTempDirectory("graft-inbox")
    val good = msg("m7", "Daily Exception Report", None, "r.csv" -> "a\n1\n")
    val bad = msg("m8", "Daily Exception Report", None, "r.csv" -> "a\n1\n")
    val svc = new FakeInbox(Seq(good, bad), failFetch = Set("m8"))
    val results = new InboxProcessor(svc, () => today).run(Seq(cfg(dir)))
    assert(results.map(_.outcome) == Seq(InboxOutcome.Processed, InboxOutcome.Error))
    assert(svc.labels("m7") == "Processed" && svc.labels("m8") == "ErrorFolder")
  }

  test("landed attachment flows into the generic importer (watch dir handoff)") {
    val root = Files.createTempDirectory("graft-inbox-e2e")
    val watch = root.resolve("file_watcher")
    val arch = Files.createDirectories(root.resolve("archive"))
    val svc = new FakeInbox(Seq(
      msg("m9", "Daily Exception Report", Some("Tue, 01 Apr 2025 09:30:00 +0000"),
        "exceptions.csv" -> "EventID,Reason\n119179,Missing\n119180,Stale\n")))
    new InboxProcessor(svc, () => today).run(Seq(cfg(watch)))

    val reg = new DatasetRegistry(spark, s"$root/registry")
    val imp = new GenericImporter(spark, reg, s"$root/warehouse", today = () => today)
    val importCfg = ImportConfig(
      configId = 9, configName = "InboxExceptions",
      datasource = "Gmail", datasettype = "Exceptions",
      sourceDirectory = watch.toString, archiveDirectory = arch.toString,
      filePattern = """\d{8}_exceptions\.csv""",
      fileType = "CSV",
      labelSource = MetaSource.Static, labelLocation = Some("Exceptions"),
      dateSource = MetaSource.Filename, dateLocation = Some("0"),
      dateFormat = Some("yyyyMMdd"), delimiter = Some("_"),
      targetTable = "public.texceptions",
      strategy = ImportStrategy.Evolve, isActive = true)
    val res = imp.run(importCfg, 4, 2)
    assert(res.files.map(_.status) == Seq(DatasetStatus.Active))
    assert(res.loadedRows == 2)
    val meta = reg.load().collect().head
    assert(meta.datasetdate == java.sql.Date.valueOf("2025-04-01")) // from the sent-date prefix
    val data = imp.readTarget("public.texceptions")
    assert(data.filter(col("eventid") === "119179").count() == 1)
  }
}
