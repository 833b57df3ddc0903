package graft.ingest

import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** S5/S6: the HTTP scrape + download operators
  * (jobscripts/meetmax_url_check.py:69-210, meetmax_url_download.py:
  * 113-157) re-expressed as partition-parallel Spark operators.
  *
  * Design: `Dataset[Long] → repartition(parallelism) → mapPartitions`
  * with one [[HttpClient]] per partition. The reference throttles to
  * ONE worker with a 5 s submission delay (politeness, not a perf
  * bug — SURVEY.md §4); here the same policy is `parallelism` × a
  * per-request [[RateLimiter]] delay, so "1 partition + 5000 ms" is
  * byte-compatible behavior while a 1000-executor cluster can dial
  * parallelism up against hosts that allow it.
  *
  * [[HttpClient]] is the I/O seam: tests inject a stub; production
  * wires `java.net.http.HttpClient`. Retry/backoff mirrors
  * systemscripts/web_utils.py:5-28 (N retries, exponential delay,
  * 429-aware).
  */
object Web {

  /** Minimal response surface the operators need. */
  final case class HttpResponse(status: Int, body: String)

  trait HttpClient extends Serializable {
    def get(url: String): HttpResponse
  }

  /** Production client (java.net.http); not exercised in CI. */
  final class JdkHttpClient(timeoutMs: Int = 30000) extends HttpClient {
    @transient private lazy val client =
      java.net.http.HttpClient.newBuilder()
        .connectTimeout(java.time.Duration.ofMillis(timeoutMs))
        .build()
    def get(url: String): HttpResponse = {
      val req = java.net.http.HttpRequest.newBuilder(java.net.URI.create(url)).GET().build()
      val res = client.send(req, java.net.http.HttpResponse.BodyHandlers.ofString())
      HttpResponse(res.statusCode(), res.body())
    }
  }

  /** web_utils.py retry policy: `retries` attempts, exponential
    * backoff from `initialDelayMs`, retry on 429 and on transport
    * errors; give up with the last failure.
    */
  final class RetryingClient(
      inner: HttpClient,
      retries: Int = 5,
      initialDelayMs: Long = 5000,
      sleep: Long => Unit = Thread.sleep
  ) extends HttpClient {
    def get(url: String): HttpResponse = {
      var delay = initialDelayMs
      var last: HttpResponse = HttpResponse(-1, "")
      var attempt = 0
      while (attempt < retries) {
        val res =
          try inner.get(url)
          catch { case e: Exception => HttpResponse(-1, e.getMessage) }
        if (res.status != 429 && res.status != -1) return res
        last = res
        attempt += 1
        if (attempt < retries) { sleep(delay); delay *= 2 }
      }
      last
    }
  }

  /** Politeness throttle: at most one request per `delayMs` per
    * partition (the reference's TASK_SUBMISSION_DELAY).
    */
  final class RateLimiter(delayMs: Long, sleep: Long => Unit = Thread.sleep)
      extends Serializable {
    private var lastAt = 0L
    def acquire(): Unit = {
      val now = System.currentTimeMillis()
      val wait = lastAt + delayMs - now
      if (wait > 0) sleep(wait)
      lastAt = math.max(now, lastAt + delayMs)
    }
  }

  /** One scraped URL-check record — the reference's result dict
    * (meetmax_url_check.py:186-195), FIXTURES.md F1.
    */
  final case class UrlCheckResult(
      eventid: Long,
      url: String,
      ifexists: Int,
      invalideventid: Boolean,
      isdownloadable: Int,
      downloadlink: String,
      statuscode: String,
      title: String
  )

  // the reference's extraction regexes (meetmax_url_check.py:111-163)
  private val TitleRe = "(?s)<title>(.*?)(?: - MeetMax)?</title>".r
  private val InvalidRe = "(?i)invalid\\s+event\\s+id".r
  private val PrivateRe = "__private-co-list_cp\\.html".r
  private val DownloadRe = """href="([^"]*__co-list_cp\.xls[^"]*)"""".r

  /** Scrape the company-list page per event id. Public URL first; on
    * a private-list marker, re-fetch the private variant — two GETs
    * max per id, matching the reference's flow.
    */
  def urlCheck(
      ids: Dataset[java.lang.Long],
      mkClient: () => HttpClient,
      baseUrl: String,
      parallelism: Int = 1,
      delayMs: Long = 5000,
      sleep: Long => Unit = Thread.sleep
  ): Dataset[UrlCheckResult] = {
    val spark = ids.sparkSession
    import spark.implicits._
    ids.repartition(parallelism).mapPartitions { part =>
      val client = mkClient()
      val limiter = new RateLimiter(delayMs, sleep)
      part.map { idBoxed =>
        val id = idBoxed.longValue()
        val url = s"$baseUrl/event_$id/__co-list_cp.html"
        limiter.acquire()
        val res =
          try client.get(url)
          catch { case e: Exception => HttpResponse(-1, e.getMessage) }
        if (res.status != 200)
          UrlCheckResult(id, url, 0, invalideventid = false, 0, "", "Failed", "")
        else {
          val body = res.body
          val invalid = InvalidRe.findFirstIn(body).isDefined
          val title = TitleRe.findFirstMatchIn(body).map(_.group(1).trim).getOrElse("")
          if (invalid) UrlCheckResult(id, url, 0, invalideventid = true, 0, "", "200", title)
          else {
            val effectiveBody =
              if (PrivateRe.findFirstIn(body).isDefined) {
                limiter.acquire()
                val priv =
                  try client.get(s"$baseUrl/event_$id/__private-co-list_cp.html")
                  catch { case e: Exception => HttpResponse(-1, e.getMessage) }
                if (priv.status == 200) priv.body else body
              } else body
            val link = DownloadRe.findFirstMatchIn(effectiveBody).map(_.group(1)).getOrElse("")
            UrlCheckResult(
              id, url, 1, invalideventid = false,
              if (link.nonEmpty) 1 else 0, link, "200", title)
          }
        }
      }
    }
  }

  final case class DownloadResult(eventid: Long, file: String, status: String)

  /** S6: download each `downloadlink` into the watch directory as
    * `{ts}_MeetMax_{id}.xls` (meetmax_url_download.py:113-157). The
    * fetch runs partition-parallel; the file write targets shared
    * storage (here: local dir; on a cluster: the distributed FS the
    * importer watches).
    */
  def download(
      rows: DataFrame,
      mkClient: () => HttpClient,
      watchDir: String,
      timestamp: String,
      parallelism: Int = 1,
      delayMs: Long = 5000,
      sleep: Long => Unit = Thread.sleep
  ): Dataset[DownloadResult] = {
    val spark = rows.sparkSession
    import spark.implicits._
    rows
      .select("eventid", "downloadlink")
      .as[(Long, String)]
      .repartition(parallelism)
      .mapPartitions { part =>
        val client = mkClient()
        val limiter = new RateLimiter(delayMs, sleep)
        part.map { case (id, link) =>
          limiter.acquire()
          val res =
            try client.get(link)
            catch { case e: Exception => HttpResponse(-1, e.getMessage) }
          if (res.status == 200) {
            val p = Paths.get(watchDir, s"${timestamp}_MeetMax_$id.xls")
            Files.createDirectories(p.getParent)
            Files.write(p, res.body.getBytes("UTF-8"))
            DownloadResult(id, p.toString, "OK")
          } else DownloadResult(id, "", s"Failed:${res.status}")
        }
      }
  }
}

/** S2: XLS/XLSX → CSV conversion seam (systemscripts/xls_to_csv.py).
  * The default implementation is [[XlsxConverter]] — a REAL zip+XML
  * XLSX decode (JDK-only, see [[Xlsx]]) with the reference's
  * engine-fallback chain (openpyxl → xlrd): inputs the XLSX reader
  * rejects go to [[BiffConverter]] (real CFB+BIFF8 legacy `.xls`
  * decode), and only non-spreadsheet payloads (CSV bytes under an .xls
  * name) reach [[PassthroughConverter]].
  */
trait XlsConverter extends Serializable {
  /** Convert `xls` to a CSV file next to it; return the CSV path. */
  def toCsv(xls: Path): Path
}

object XlsConverter {
  /** Spreadsheet decode buffers the whole file (a CFB container needs
    * random access), so inputs are bounded: the reference's `.xls`
    * payloads are MB-scale mail attachments, and a multi-GB file under
    * a spreadsheet name is hostile or corrupt, not data — it must land
    * on the Failed status path, never in driver memory.
    */
  val DefaultMaxBytes: Long = 256L * 1024 * 1024
}

/** Thrown instead of buffering when a spreadsheet exceeds the size cap;
  * the importer maps it to status=Failed + archive (NOT the CSV
  * passthrough other conversion failures take).
  */
final class OversizedSpreadsheetException(size: Long, maxBytes: Long)
    extends java.io.IOException(
      s"spreadsheet is $size bytes; conversion cap is $maxBytes")

final class PassthroughConverter extends XlsConverter {
  def toCsv(xls: Path): Path = {
    val csv = Paths.get(xls.toString.replaceAll("\\.[^.]*$", "") + ".csv")
    Files.copy(xls, csv, java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    csv
  }
}
