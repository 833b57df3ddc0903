package graft.report

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.model.ReportConfig

/** Report rendering — the `send_reports.py` path (SURVEY.md §3.2):
  * each `{{placeholder}}` in the body template is replaced by an HTML
  * grid of its query's result (K3); attachment queries render to CSV
  * text (K2); delivery goes through the pluggable [[Mailer]] (K4 —
  * real SMTP lives outside the engine and outside CI).
  *
  * Rendering collects to the driver by design: report grids are
  * human-sized (the reference renders full result sets of analytic
  * queries; we add an explicit `maxRows` guard so a mis-scoped query
  * cannot pull a fact table through the driver).
  */
final class ReportRunner(
    spark: SparkSession,
    mailer: Mailer,
    maxRows: Int = 100000
) {

  def run(config: ReportConfig): RenderedReport = {
    val body = config.emailBodyQueries.foldLeft(config.bodyTemplate) {
      case (tpl, (placeholder, sql)) =>
        tpl.replace(s"{{$placeholder}}", HtmlRenderer.grid(capped(spark.sql(sql))))
    }
    val attachments = config.attachmentQueries.map { aq =>
      Attachment(aq.name, CsvRenderer.render(capped(spark.sql(aq.query))))
    }
    val rendered = RenderedReport(config.subject, config.recipients, body, attachments)
    mailer.send(rendered)
    rendered
  }

  private def capped(df: DataFrame): DataFrame = df.limit(maxRows)
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

/** K3: `df.to_html`-equivalent grid (bordered, striped classes match
  * the reference's `to_html(classes="table table-striped", border=1)`
  * at send_reports.py:115-117).
  */
object HtmlRenderer {
  def grid(df: DataFrame): String = {
    val cols = df.columns
    val rows = df.collect()
    val sb = new StringBuilder
    sb ++= """<table border="1" class="dataframe table table-striped">"""
    sb ++= cols.mkString("<thead><tr><th>", "</th><th>", "</th></tr></thead>")
    sb ++= "<tbody>"
    rows.foreach { r =>
      sb ++= cols.indices
        .map(i => escape(if (r.isNullAt(i)) "" else r.get(i).toString))
        .mkString("<tr><td>", "</td><td>", "</td></tr>")
    }
    sb ++= "</tbody></table>"
    sb.toString
  }

  private def escape(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
}

/** K2: CSV with QUOTE_NONNUMERIC parity — the reference writes every
  * non-numeric field quoted (xls_to_csv.py:80, meetmax_url_check.py:300).
  */
object CsvRenderer {
  def render(df: DataFrame): String = {
    val numeric = df.schema.map(f =>
      f.dataType.typeName match {
        case "integer" | "long" | "double" | "float" | "short" | "byte" => true
        case t if t.startsWith("decimal") => true
        case _ => false
      })
    val sb = new StringBuilder
    sb ++= df.columns.map(quote).mkString(",") += '\n'
    df.collect().foreach { r =>
      sb ++= df.columns.indices
        .map { i =>
          if (r.isNullAt(i)) ""
          else if (numeric(i)) r.get(i).toString
          else quote(r.get(i).toString)
        }
        .mkString(",") += '\n'
    }
    sb.toString
  }

  private def quote(s: String): String = "\"" + s.replace("\"", "\"\"") + "\""
}
