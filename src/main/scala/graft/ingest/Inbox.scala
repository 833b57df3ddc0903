package graft.ingest

import java.nio.file.{Files, Path, Paths}
import java.time.LocalDate
import java.time.format.DateTimeFormatter
import java.util.Locale

import scala.util.matching.Regex

/** S7: the Gmail-shaped inbox source
  * (`systemscripts/gmail_inbox_processor.py:67-196`). The mailbox API
  * sits behind [[InboxService]] — the same I/O-seam pattern as S5/S6's
  * `HttpClient` and K4's `Mailer` — so the match/save/relabel state
  * machine is real, driver-side, and testable against an in-memory
  * service; an OAuth-backed implementation drops in off-container.
  *
  * Semantics mirrored from the reference:
  *  - config match (`email_matches_config`, `:89-107`): subject
  *    pattern is a case-insensitive SEARCH (`re.search`, anywhere in
  *    the subject, `:91`); an attachment matches if its filename
  *    searches against `attachmentNamePattern`, or if no pattern is
  *    set, any attachment counts (`:94-103`); `hasAttachment=true`
  *    requires a matching attachment (`:105`); the FIRST matching
  *    config wins (`:181-184`);
  *  - processing (`process_email`, `:109-152`): the save-name date
  *    prefix is the message's `Date` header parsed as
  *    `%a, %d %b %Y %H:%M:%S %z`, falling back to today (`:113-118`);
  *    the raw message is saved as `{yyyyMMdd}_{msgId}.eml` (`:120-125`)
  *    and each MATCHING attachment as `{yyyyMMdd}_{filename}`
  *    (`:127-143`); then the message is relabeled INBOX → Processed
  *    (`:145-146`);
  *  - a message matching no config relabels INBOX → ErrorFolder
  *    (`:189-191`); a processing failure also relabels to ErrorFolder,
  *    itself best-effort (`:192-197`).
  */
final case class InboxConfig(
    configId: Int,
    configName: String,
    gmailAccount: String,
    subjectPattern: Option[String],
    hasAttachment: Boolean,
    attachmentNamePattern: Option[String],
    localRepositoryPath: String,
    isActive: Boolean = true
)

final case class MailAttachment(filename: String, data: Array[Byte])

/** One inbox message as the processor sees it: the `format='full'`
  * metadata (subject / date header / attachment names) plus lazy
  * access to raw bytes and attachment payloads via the service.
  */
final case class MailMessage(
    id: String,
    subject: String,
    dateHeader: Option[String],
    attachments: Seq[MailAttachment],
    raw: Array[Byte]
)

/** The mailbox seam: list, fetch, relabel. */
trait InboxService {
  def listInbox(): Seq[String]
  def fetch(id: String): MailMessage
  def relabel(id: String, removeLabel: String, addLabel: String): Unit
}

sealed trait InboxOutcome
object InboxOutcome {
  case object Processed extends InboxOutcome
  case object NoMatch extends InboxOutcome
  case object Error extends InboxOutcome
}

final case class InboxResult(
    msgId: String,
    configId: Option[Int],
    outcome: InboxOutcome,
    savedFiles: Seq[Path]
)

final class InboxProcessor(
    service: InboxService,
    today: () => LocalDate = () => LocalDate.now()
) {

  val InboxLabel = "INBOX"
  val ProcessedLabel = "Processed" // gmail_inbox_processor.py:26
  val ErrorLabel = "ErrorFolder" // gmail_inbox_processor.py:27

  private val SentDateFmt =
    DateTimeFormatter.ofPattern("EEE, d MMM yyyy HH:mm:ss Z", Locale.US)

  private def searchIgnoreCase(pattern: String, in: String): Boolean =
    new Regex("(?i)" + pattern).findFirstIn(in).isDefined

  private def attachmentMatches(cfg: InboxConfig, filename: String): Boolean =
    cfg.attachmentNamePattern.forall(p => searchIgnoreCase(p, filename))

  /** `email_matches_config` (`gmail_inbox_processor.py:89-107`). */
  def matches(cfg: InboxConfig, msg: MailMessage): Boolean = {
    val subjectOk = cfg.subjectPattern.forall(p => searchIgnoreCase(p, msg.subject))
    val hasMatching = msg.attachments.exists(a => attachmentMatches(cfg, a.filename))
    subjectOk && (!cfg.hasAttachment || hasMatching)
  }

  /** Date-header prefix with today-fallback (`:113-118`). */
  private def datePrefix(msg: MailMessage): String = {
    val parsed = msg.dateHeader.flatMap { s =>
      try Some(java.time.OffsetDateTime.parse(s.trim, SentDateFmt).toLocalDate)
      catch { case _: Exception => None }
    }
    parsed.getOrElse(today()).format(DateTimeFormatter.BASIC_ISO_DATE)
  }

  /** Untrusted mail data used in a filesystem path: keep only the
    * basename (a name like `a/../../x` must not step outside the
    * repository), drop NULs, and never let the result be empty or a
    * dot-dir.
    */
  private[ingest] def safeName(filename: String): String = {
    // clean (NULs, outer whitespace) BEFORE the dot-dir filter: a name
    // like "..\u0000" or ".. " must not sanitize back into ".." after
    // the filter already ran
    val base = filename.filterNot(_ == '\u0000').replace('\\', '/').split('/')
      .map(_.trim)
      .filter(s => s.nonEmpty && s != "." && s != "..")
      .lastOption.getOrElse("attachment")
    if (base.isEmpty || base == "." || base == "..") "attachment" else base
  }

  /** Write without clobbering: same-day same-name attachments from
    * DIFFERENT messages must both survive, so on collision a `_n`
    * suffix is added before the extension; `CREATE_NEW` makes the
    * exists-check-then-write race-safe. A collision with IDENTICAL
    * bytes reuses the existing file instead — reprocessing a message
    * whose relabel failed transiently stays idempotent rather than
    * feeding the importer duplicate copies.
    */
  private def writeFresh(dir: Path, name: String, data: Array[Byte]): Path = {
    val dot = name.lastIndexOf('.')
    val (stem, ext) = if (dot > 0) (name.substring(0, dot), name.substring(dot)) else (name, "")
    var i = 0
    while (true) {
      val candidate = dir.resolve(if (i == 0) name else s"${stem}_$i$ext")
      try return Files.write(candidate, data, java.nio.file.StandardOpenOption.CREATE_NEW)
      catch {
        case _: java.nio.file.FileAlreadyExistsException =>
          if (java.util.Arrays.equals(Files.readAllBytes(candidate), data)) return candidate
          i += 1
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** `process_email` (`:109-152`): save the .eml + matching
    * attachments into the config's repository (typically the
    * `file_watcher/` the importer scans), then relabel to Processed.
    */
  private def processOne(cfg: InboxConfig, msg: MailMessage): Seq[Path] = {
    val dir = Paths.get(cfg.localRepositoryPath)
    Files.createDirectories(dir)
    val prefix = datePrefix(msg)
    val eml = writeFresh(dir, s"${prefix}_${safeName(msg.id)}.eml", msg.raw)
    val atts = msg.attachments.filter(a => attachmentMatches(cfg, a.filename)).map { a =>
      writeFresh(dir, s"${prefix}_${safeName(a.filename)}", a.data)
    }
    service.relabel(msg.id, InboxLabel, ProcessedLabel)
    eml +: atts
  }

  /** The main loop (`gmail_inbox_processor.py:154-197`): first active
    * matching config wins; no match → ErrorFolder; failure →
    * best-effort ErrorFolder.
    */
  def run(configs: Seq[InboxConfig]): Seq[InboxResult] = {
    val active = configs.filter(_.isActive)
    service.listInbox().map { msgId =>
      try {
        val msg = service.fetch(msgId)
        active.find(matches(_, msg)) match {
          case Some(cfg) =>
            InboxResult(msgId, Some(cfg.configId), InboxOutcome.Processed, processOne(cfg, msg))
          case None =>
            service.relabel(msgId, InboxLabel, ErrorLabel)
            InboxResult(msgId, None, InboxOutcome.NoMatch, Nil)
        }
      } catch {
        case _: Exception =>
          try service.relabel(msgId, InboxLabel, ErrorLabel)
          catch { case _: Exception => () } // best-effort (:192-197)
          InboxResult(msgId, None, InboxOutcome.Error, Nil)
      }
    }
  }
}
