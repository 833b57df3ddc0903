package graft.report

import java.io.{BufferedReader, InputStreamReader, OutputStreamWriter}
import java.net.Socket
import java.nio.charset.StandardCharsets
import java.util.Base64

/** K4 delivery: a real SMTP [[Mailer]] — MIME multipart assembly and
  * the SMTP dialogue, both JDK-only (the container has no mail
  * library, and SMTP is a four-verb line protocol).
  *
  * Mirrors `jobscripts/send_reports.py:52-80`: a `multipart/mixed`
  * message with From / To (comma-joined) / Subject headers, a
  * `text/html` body part, and one base64 `application/octet-stream`
  * part per attachment with `Content-Disposition: attachment;
  * filename=...`; delivery is MAIL FROM → RCPT TO (one per recipient)
  * → DATA, authenticated with AUTH LOGIN when credentials are set
  * (`server.login`, `:76`). `ssl=true` wraps the socket in TLS
  * (the reference's `SMTP_SSL` on port 465); the integration test
  * drives the plaintext form against a local stub server, the same
  * seam pattern WebSpec uses for HTTP.
  */
final case class SmtpConfig(
    host: String,
    port: Int,
    from: String,
    username: Option[String] = None,
    password: Option[String] = None,
    ssl: Boolean = false
)

final class SmtpMailer(config: SmtpConfig) extends Mailer {

  private val Boundary = "=_graft_mime_boundary"

  private def b64(bytes: Array[Byte]): String =
    Base64.getEncoder.encodeToString(bytes).grouped(76).mkString("\r\n")

  /** Values interpolated into MIME headers or SMTP commands must not
    * carry CR/LF — a subject (or attachment name) containing "\r\n"
    * would otherwise inject arbitrary headers into the message, and a
    * recipient could inject extra SMTP verbs. Dot-stuffing protects the
    * DATA body only, not header construction.
    */
  private def headerSafe(s: String): String =
    s.replace('\r', ' ').replace('\n', ' ')

  /** Address form for To / MAIL FROM / RCPT TO: header-safe plus no
    * angle brackets (they delimit the SMTP path).
    */
  private def addrSafe(s: String): String =
    headerSafe(s).replace("<", "").replace(">", "").trim

  /** Content-Disposition filename: simple names stay bare (the
    * reference's MIMEBase form); anything with spaces, ';', or quotes
    * is emitted as a QUOTED parameter (quotes stripped inside) so a
    * name cannot terminate the parameter or smuggle another one.
    */
  private def dispositionName(s: String): String = {
    val safe = headerSafe(s)
    if (safe.matches("[A-Za-z0-9._-]+")) safe
    else "\"" + safe.replace("\"", "") + "\""
  }

  /** The full RFC-5322 message, CRLF line endings. */
  def mime(report: RenderedReport): String = {
    val sb = new StringBuilder
    def line(s: String): Unit = { sb ++= s; sb ++= "\r\n" }
    line(s"From: ${addrSafe(config.from)}")
    line(s"To: ${report.recipients.map(addrSafe).mkString(", ")}") // ", ".join (:56)
    line(s"Subject: ${headerSafe(report.subject)}")
    line("MIME-Version: 1.0")
    line(s"""Content-Type: multipart/mixed; boundary="$Boundary"""")
    line("")
    line(s"--$Boundary")
    line("Content-Type: text/html; charset=utf-8") // MIMEText(body,'html') (:60)
    line("")
    line(report.htmlBody)
    report.attachments.foreach { a =>
      line(s"--$Boundary")
      line("Content-Type: application/octet-stream") // MIMEBase (:64-68)
      line("Content-Transfer-Encoding: base64")
      line(s"Content-Disposition: attachment; filename=${dispositionName(a.name)}")
      line("")
      line(b64(a.content.getBytes(StandardCharsets.UTF_8)))
    }
    line(s"--$Boundary--")
    sb.toString
  }

  def send(report: RenderedReport): Unit = {
    val socket: Socket =
      if (config.ssl)
        javax.net.ssl.SSLSocketFactory.getDefault.createSocket(config.host, config.port)
      else new Socket(config.host, config.port)
    try {
      val in = new BufferedReader(
        new InputStreamReader(socket.getInputStream, StandardCharsets.UTF_8))
      val out = new OutputStreamWriter(socket.getOutputStream, StandardCharsets.UTF_8)
      def expect(codes: Int*): Unit = {
        // multi-line replies: "250-..." continues, "250 ..." ends
        var lastLine = in.readLine()
        while (lastLine != null && lastLine.length >= 4 && lastLine.charAt(3) == '-')
          lastLine = in.readLine()
        val code = Option(lastLine).map(_.take(3).toInt)
          .getOrElse(throw new RuntimeException("SMTP connection closed"))
        if (!codes.contains(code))
          throw new RuntimeException(s"SMTP error: expected ${codes.mkString("/")}, got $lastLine")
      }
      def cmd(s: String, codes: Int*): Unit = {
        out.write(s); out.write("\r\n"); out.flush(); expect(codes: _*)
      }
      expect(220)
      cmd("EHLO graft", 250)
      (config.username, config.password) match {
        case (Some(u), Some(p)) =>
          cmd("AUTH LOGIN", 334)
          cmd(Base64.getEncoder.encodeToString(u.getBytes(StandardCharsets.UTF_8)), 334)
          cmd(Base64.getEncoder.encodeToString(p.getBytes(StandardCharsets.UTF_8)), 235)
        case _ => ()
      }
      cmd(s"MAIL FROM:<${addrSafe(config.from)}>", 250)
      report.recipients.foreach(r => cmd(s"RCPT TO:<${addrSafe(r)}>", 250, 251))
      cmd("DATA", 354)
      // dot-stuffing (RFC 5321 §4.5.2): a leading "." doubles
      mime(report).split("\r\n", -1).foreach { l =>
        out.write(if (l.startsWith(".")) "." + l else l); out.write("\r\n")
      }
      cmd(".", 250)
      cmd("QUIT", 221)
    } finally socket.close()
  }
}
