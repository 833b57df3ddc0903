package graft.model

import java.sql.{Date, Timestamp}

/** Dataset lifecycle statuses, mirroring the seed rows of
  * `dba.tdatastatus` (reference: onboarding/sql/dataset_setup.sql:363-378).
  */
sealed abstract class DatasetStatus(val id: Int, val name: String)
object DatasetStatus {
  case object Active   extends DatasetStatus(1, "Active")
  case object Inactive extends DatasetStatus(2, "Inactive")
  case object Deleted  extends DatasetStatus(3, "Deleted")
  case object New      extends DatasetStatus(4, "New")
  case object Failed   extends DatasetStatus(5, "Failed")
  case object Empty    extends DatasetStatus(6, "Empty")

  val all: Seq[DatasetStatus] = Seq(Active, Inactive, Deleted, New, Failed, Empty)
  def byName(n: String): Option[DatasetStatus] = all.find(_.name.equalsIgnoreCase(n))
  def byId(i: Int): Option[DatasetStatus] = all.find(_.id == i)
}

/** One versioned dataset snapshot — a row of the registry, mirroring
  * `dba.tdataset` (reference: onboarding/sql/dataset_setup.sql:122-139).
  * Every ingested batch is stamped with its `datasetid`; analytic reads
  * resolve "current data" by semi-joining facts against the registry's
  * active rows, which at 100 TB is a broadcast of a tiny dimension.
  */
final case class DatasetMeta(
    datasetid: Long,
    datasetdate: Date,
    label: String,
    datasettypeid: Int,
    datasourceid: Int,
    datastatusid: Int,
    efffromdate: Timestamp,
    effthrudate: Option[Timestamp],
    isactive: Boolean,
    createddate: Timestamp,
    createdby: String
)

/** Lookup dims mirroring `dba.tdatasource` / `dba.tdatasettype`
  * (reference: onboarding/sql/dataset_setup.sql:14-117,517-533).
  */
final case class DataSource(datasourceid: Int, name: String)
final case class DatasetType(datasettypeid: Int, name: String)

/** How a metadata field (label / dataset date) is extracted.
  * Mirrors the `metadata_label_source` / `dateconfig` CHECKs of
  * `dba.timportconfig` (reference:
  * onboarding/sql/create_importconfig_table.sql:30-33,46-50) and the
  * parse behavior of `systemscripts/generic_import.py:86-125`:
  *   - `filename` + all-digits location → split basename on delimiter,
  *     take that index;
  *   - `filename` + non-digit location → regex `search`, group(1) if
  *     the pattern has groups else group(0);
  *   - `static` → the location string itself is the value.
  */
sealed trait MetaSource
object MetaSource {
  case object Filename    extends MetaSource
  case object FileContent extends MetaSource
  case object Static      extends MetaSource
  def parse(s: String): Either[String, MetaSource] = s match {
    case "filename"     => Right(Filename)
    case "file_content" => Right(FileContent)
    case "static"       => Right(Static)
    case other          => Left(s"invalid metadata source '$other' (filename|file_content|static)")
  }
}

/** Column-mismatch handling strategies, mirroring `dba.timportstrategy`
  * seeds (reference: onboarding/sql/create_importconfig_table.sql:13-17).
  */
sealed abstract class ImportStrategy(val id: Int)
object ImportStrategy {
  /** 1 — evolve: add new columns to the target schema. */
  case object Evolve extends ImportStrategy(1)
  /** 2 — ignore columns the target doesn't have. */
  case object IgnoreNew extends ImportStrategy(2)
  /** 3 — fail if the source is missing target columns. */
  case object FailOnMissing extends ImportStrategy(3)
  def byId(i: Int): Either[String, ImportStrategy] = i match {
    case 1 => Right(Evolve); case 2 => Right(IgnoreNew); case 3 => Right(FailOnMissing)
    case o => Left(s"invalid import strategy id $o (1|2|3)")
  }
}

/** Import configuration — the engine's API surface for file ingestion,
  * mirroring `dba.timportconfig` (reference:
  * onboarding/sql/create_importconfig_table.sql:20-51). The smart
  * constructor `ImportConfig.validated` reproduces every CHECK
  * constraint (`:28-31,41-50`) so invalid configs are rejected at
  * construction, like the reference rejects them at INSERT.
  */
final case class ImportConfig(
    configId: Int,
    configName: String,
    datasource: String,
    datasettype: String,
    sourceDirectory: String,
    archiveDirectory: String,
    filePattern: String,
    fileType: String,
    labelSource: MetaSource,
    labelLocation: Option[String],
    dateSource: MetaSource,
    dateLocation: Option[String],
    dateFormat: Option[String],
    delimiter: Option[String],
    targetTable: String,
    strategy: ImportStrategy,
    isActive: Boolean
)

object ImportConfig {
  private val fileTypes = Set("CSV", "XLS", "XLSX")
  private val absDirNoSlash = "^/.*[^/]$".r

  def validated(c: ImportConfig): Either[List[String], ImportConfig] = {
    val errs = List.newBuilder[String]
    if (!fileTypes.contains(c.fileType))
      errs += s"file_type '${c.fileType}' not in $fileTypes"
    if (c.sourceDirectory == c.archiveDirectory)
      errs += "source_directory must differ from archive_directory"
    if (absDirNoSlash.findFirstIn(c.sourceDirectory).isEmpty)
      errs += s"source_directory '${c.sourceDirectory}' must be absolute without trailing slash"
    if (absDirNoSlash.findFirstIn(c.archiveDirectory).isEmpty)
      errs += s"archive_directory '${c.archiveDirectory}' must be absolute without trailing slash"
    // valid_date CHECK (create_importconfig_table.sql:46-50)
    c.dateSource match {
      case MetaSource.Filename =>
        if (!c.dateLocation.exists(_.forall(_.isDigit)))
          errs += "dateconfig=filename requires numeric datelocation"
        if (c.delimiter.isEmpty) errs += "dateconfig=filename requires delimiter"
        if (c.dateFormat.isEmpty) errs += "dateconfig=filename requires dateformat"
      case MetaSource.FileContent =>
        if (!c.dateLocation.exists(_.matches("^[a-zA-Z0-9_]+$")))
          errs += "dateconfig=file_content requires identifier datelocation"
        if (c.dateFormat.isEmpty) errs += "dateconfig=file_content requires dateformat"
      case MetaSource.Static =>
        if (c.dateFormat.isEmpty) errs += "dateconfig=static requires dateformat"
    }
    val e = errs.result()
    if (e.isEmpty) Right(c) else Left(e)
  }
}

/** Structured log row, mirroring `dba.tlogentry`
  * (reference: systemscripts/log_utils.py:24-128 and
  * onboarding/sql/setup_dba_maintenance.sql:51-61). Appended in
  * buffered batches — never a connection per line.
  */
final case class LogEntry(
    runUuid: String,
    ts: Timestamp,
    level: String,
    step: String,
    message: String,
    user: String,
    script: String,
    elapsedSec: Double
)

/** Scheduled-task row, mirroring `dba.tscheduler` (reference:
  * onboarding/sql/create_tscheduler.sql:1-12). The reference renders
  * these rows into /etc/cron.d entries (jobscripts/update_cron_jobs
  * .py:13-33); here the validated config is the engine's scheduling
  * API surface (execution belongs to whatever scheduler hosts the
  * jobs — cron, Airflow, a streaming trigger).
  */
final case class ScheduledTask(
    schedulerId: Int,
    taskName: String,
    taskDescription: Option[String],
    frequency: String, // 5-field cron expression
    scriptPath: String,
    scriptArgs: Option[String],
    isActive: Boolean
)

object ScheduledTask {
  private val fieldRe = "^[0-9*,/\\-]+$".r

  /** Minimal cron validation: 5 fields, each from the cron charset —
    * enough to reject the malformed rows the reference's renderer
    * would happily write into /etc/cron.d.
    */
  def validated(t: ScheduledTask): Either[List[String], ScheduledTask] = {
    val errs = List.newBuilder[String]
    val fields = t.frequency.trim.split("\\s+")
    if (fields.length != 5)
      errs += s"frequency '${t.frequency}' must have 5 cron fields, got ${fields.length}"
    else
      fields.zip(Seq("minute", "hour", "dom", "month", "dow")).foreach { case (f, n) =>
        if (fieldRe.findFirstIn(f).isEmpty) errs += s"cron $n field '$f' is invalid"
      }
    if (t.taskName.trim.isEmpty) errs += "taskname must be non-empty"
    if (t.scriptPath.trim.isEmpty) errs += "scriptpath must be non-empty"
    val e = errs.result()
    if (e.isEmpty) Right(t) else Left(e)
  }
}

/** Report configuration, mirroring `dba.treportmanager` (reference:
  * onboarding/sql/create_treportmanager.sql:6-20): an HTML template
  * with `{{placeholder}}` slots filled by query grids, plus named CSV
  * attachment queries (consumed at jobscripts/send_reports.py:110-135).
  */
final case class ReportConfig(
    reportId: Int,
    reportName: String,
    recipients: Seq[String],
    subject: String,
    bodyTemplate: String,
    emailBodyQueries: Map[String, String],
    attachmentQueries: Seq[AttachmentQuery],
    isActive: Boolean
)
final case class AttachmentQuery(name: String, query: String)

object ReportConfig {

  /** Parse the reference's JSONB column shapes (Q30;
    * create_treportmanager.sql:31-33):
    *   - emailbodyqueries: `{"placeholder": "SELECT ..."}`
    *   - attachmentqueries: `[{"name": "f.csv", "query": "SELECT ..."}]`
    * json4s ships with Spark, so config rows stored as JSON strings
    * parse without extra dependencies.
    */
  def parseBodyQueries(json: String): Either[String, Map[String, String]] =
    try {
      import org.json4s._
      import org.json4s.jackson.JsonMethods
      JsonMethods.parse(json) match {
        case JObject(fields) =>
          val pairs = fields.collect { case (k, JString(v)) => k -> v }
          if (pairs.length == fields.length) Right(pairs.toMap)
          else Left("emailbodyqueries values must all be strings")
        case _ => Left("emailbodyqueries must be a JSON object")
      }
    } catch { case e: Exception => Left(s"invalid JSON: ${e.getMessage}") }

  def parseAttachmentQueries(json: String): Either[String, Seq[AttachmentQuery]] =
    try {
      import org.json4s._
      import org.json4s.jackson.JsonMethods
      JsonMethods.parse(json) match {
        case JArray(items) =>
          val parsed = items.map {
            case JObject(fs) =>
              val m = fs.collect { case (k, JString(v)) => k -> v }.toMap
              for {
                n <- m.get("name").toRight("attachment entry missing 'name'")
                q <- m.get("query").toRight("attachment entry missing 'query'")
              } yield AttachmentQuery(n, q)
            case _ => Left("attachment entries must be objects")
          }
          parsed.collectFirst { case Left(e) => e } match {
            case Some(e) => Left(e)
            case None    => Right(parsed.collect { case Right(a) => a })
          }
        case _ => Left("attachmentqueries must be a JSON array")
      }
    } catch { case e: Exception => Left(s"invalid JSON: ${e.getMessage}") }
}
