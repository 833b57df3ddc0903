package graft.report

import org.apache.spark.sql.{DataFrame, Row, SparkSession}

import graft.model.ReportConfig

/** Report rendering — the `send_reports.py` path (SURVEY.md §3.2):
  * each `{{placeholder}}` in the body template is replaced by an HTML
  * grid of its query's result (K3); attachment queries render to CSV
  * text (K2); delivery goes through the pluggable [[Mailer]] (K4 —
  * real SMTP lives outside the engine and outside CI).
  *
  * Rendering collects to the driver by design: report grids are
  * human-sized (the reference renders full result sets of analytic
  * queries). The `maxRows` cap means a mis-scoped query against a fact
  * table cannot pull the whole table through the driver — only
  * `maxRows + 1` rows are ever collected, truncation is visible in the
  * rendered output (a marker row, mirroring the importer's
  * truncation-count discipline), and each truncated grid is logged
  * through `onTruncate`.
  */
final class ReportRunner(
    spark: SparkSession,
    mailer: Mailer,
    maxRows: Int = 100000,
    onTruncate: String => Unit = _ => ()
) {

  def run(config: ReportConfig): RenderedReport = {
    val body = config.emailBodyQueries.foldLeft(config.bodyTemplate) {
      case (tpl, (placeholder, sql)) =>
        val (html, truncated) = HtmlRenderer.gridWithInfo(spark.sql(sql), maxRows)
        if (truncated) onTruncate(s"report grid '$placeholder' truncated at $maxRows rows")
        tpl.replace(s"{{$placeholder}}", html)
    }
    val attachments = config.attachmentQueries.map { aq =>
      val (csv, truncated) = CsvRenderer.renderWithInfo(spark.sql(aq.query), maxRows)
      if (truncated) onTruncate(s"attachment '${aq.name}' truncated at $maxRows rows")
      Attachment(aq.name, csv)
    }
    val rendered = RenderedReport(config.subject, config.recipients, body, attachments)
    mailer.send(rendered)
    rendered
  }
}

final case class Attachment(name: String, content: String)
final case class RenderedReport(
    subject: String,
    recipients: Seq[String],
    htmlBody: String,
    attachments: Seq[Attachment]
)

/** Delivery seam (K4). Tests use [[InMemoryMailer]]; production wires
  * an SMTP client here.
  */
trait Mailer { def send(report: RenderedReport): Unit }

final class InMemoryMailer extends Mailer {
  val sent = scala.collection.mutable.ArrayBuffer.empty[RenderedReport]
  def send(report: RenderedReport): Unit = sent += report
}

/** Collects at most `maxRows + 1` rows — the sentinel extra row proves
  * truncation without counting the full result.
  */
private[report] object CappedCollect {
  def apply(df: DataFrame, maxRows: Int): (Array[Row], Boolean) = {
    require(maxRows > 0, s"maxRows must be positive, got $maxRows")
    val rows =
      if (maxRows == Int.MaxValue) df.collect()
      else df.limit(maxRows + 1).collect()
    if (rows.length > maxRows) (rows.take(maxRows), true) else (rows, false)
  }
}

/** K3: `df.to_html`-equivalent grid (bordered, striped classes match
  * the reference's `to_html(classes="table table-striped", border=1)`
  * at send_reports.py:115-117). With the default (unbounded) `maxRows`
  * the output is byte-identical to the uncapped renderer; a capped,
  * truncated grid gains one marker row.
  */
object HtmlRenderer {
  def grid(df: DataFrame, maxRows: Int = Int.MaxValue): String =
    gridWithInfo(df, maxRows)._1

  /** @return (html, truncated) */
  def gridWithInfo(df: DataFrame, maxRows: Int = Int.MaxValue): (String, Boolean) = {
    val cols = df.columns
    val (rows, truncated) = CappedCollect(df, maxRows)
    val sb = new StringBuilder
    sb ++= """<table border="1" class="dataframe table table-striped">"""
    sb ++= cols.mkString("<thead><tr><th>", "</th><th>", "</th></tr></thead>")
    sb ++= "<tbody>"
    rows.foreach { r =>
      sb ++= cols.indices
        .map(i => escape(if (r.isNullAt(i)) "" else r.get(i).toString))
        .mkString("<tr><td>", "</td><td>", "</td></tr>")
    }
    if (truncated)
      sb ++= s"""<tr><td colspan="${cols.length}">… truncated at $maxRows rows</td></tr>"""
    sb ++= "</tbody></table>"
    (sb.toString, truncated)
  }

  private def escape(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
}

/** K2: CSV with QUOTE_NONNUMERIC parity — the reference writes every
  * non-numeric field quoted (xls_to_csv.py:80, meetmax_url_check.py:300).
  * A truncated render ends with one quoted marker line.
  */
object CsvRenderer {
  def render(df: DataFrame, maxRows: Int = Int.MaxValue): String =
    renderWithInfo(df, maxRows)._1

  /** @return (csv, truncated) */
  def renderWithInfo(df: DataFrame, maxRows: Int = Int.MaxValue): (String, Boolean) = {
    val numeric = df.schema.map(f =>
      f.dataType.typeName match {
        case "integer" | "long" | "double" | "float" | "short" | "byte" => true
        case t if t.startsWith("decimal") => true
        case _ => false
      })
    val (rows, truncated) = CappedCollect(df, maxRows)
    val sb = new StringBuilder
    sb ++= df.columns.map(quote).mkString(",") += '\n'
    rows.foreach { r =>
      sb ++= df.columns.indices
        .map { i =>
          if (r.isNullAt(i)) ""
          else if (numeric(i)) r.get(i).toString
          else quote(r.get(i).toString)
        }
        .mkString(",") += '\n'
    }
    if (truncated) sb ++= quote(s"… truncated at $maxRows rows") += '\n'
    (sb.toString, truncated)
  }

  private def quote(s: String): String = "\"" + s.replace("\"", "\"\"") + "\""
}
