package graft

import java.nio.file.Files

import graft.ingest.Web
import graft.ingest.Web.{HttpClient, HttpResponse}

/** Stub site for the scrape/download operators: event 1 is public +
  * downloadable, 2 has a private list with a download link, 3 is an
  * invalid event, 4 is missing (404), 5 exists but isn't downloadable.
  * Top-level class: instances are constructed inside executor tasks
  * and must not capture the spec.
  */
class StubSite extends HttpClient {
  def get(url: String): HttpResponse = url match {
    case u if u.contains("event_1/__co-list_cp.html") =>
      HttpResponse(200,
        """<title>Conf One - MeetMax</title><a href="/sched/event_1/__co-list_cp.xls?event_id=1">dl</a>""")
    case u if u.contains("event_2/__co-list_cp.html") =>
      HttpResponse(200, """<title>Conf Two - MeetMax</title> see __private-co-list_cp.html""")
    case u if u.contains("event_2/__private-co-list_cp.html") =>
      HttpResponse(200, """<a href="/sched/event_2/__co-list_cp.xls?event_id=2">dl</a>""")
    case u if u.contains("event_3/") =>
      HttpResponse(200, "<title>Oops</title> Invalid Event ID")
    case u if u.contains("event_4/") => HttpResponse(404, "not found")
    case u if u.contains("event_5/") =>
      HttpResponse(200, "<title>Conf Five - MeetMax</title> nothing to download")
    case u if u.endsWith(".xls?event_id=1") => HttpResponse(200, "EventID,Name\n1,A\n")
    case _ => HttpResponse(500, "boom")
  }
}

object WebSpec {
  val noSleep: Long => Unit = _ => ()
}

/** S5/S6 scrape+download operators driven against a stub HTTP world —
  * public/private/invalid/missing event pages, 429 retry behavior,
  * per-partition rate limiting.
  */
class WebSpec extends SparkSpec {
  import spark.implicits._

  test("urlCheck classifies public/private/invalid/missing/non-downloadable events") {
    val ids = spark.createDataset(Seq(1L, 2L, 3L, 4L, 5L).map(java.lang.Long.valueOf))
    val res = Web
      .urlCheck(ids, () => new StubSite, "https://x/sched", parallelism = 2,
        delayMs = 0, sleep = WebSpec.noSleep)
      .collect()
      .map(r => r.eventid -> r)
      .toMap
    assert(res(1L).isdownloadable == 1 && res(1L).downloadlink.contains("event_1"))
    assert(res(1L).title == "Conf One")
    assert(res(2L).isdownloadable == 1 && res(2L).downloadlink.contains("event_2"))
    assert(res(3L).invalideventid && res(3L).ifexists == 0)
    assert(res(4L).statuscode == "Failed")
    assert(res(5L).ifexists == 1 && res(5L).isdownloadable == 0)
  }

  test("RetryingClient retries 429 with exponential backoff, stops on success") {
    var attempts = 0
    val flaky = new HttpClient {
      def get(url: String): HttpResponse = {
        attempts += 1
        if (attempts < 3) HttpResponse(429, "slow down") else HttpResponse(200, "ok")
      }
    }
    val delays = scala.collection.mutable.ArrayBuffer.empty[Long]
    val c = new Web.RetryingClient(flaky, retries = 5, initialDelayMs = 10, sleep = delays += _)
    val res = c.get("u")
    assert(res.status == 200 && attempts == 3)
    assert(delays.toSeq == Seq(10L, 20L)) // exponential
    // exhausted retries surface the last failure
    val always429 = new HttpClient { def get(u: String) = HttpResponse(429, "no") }
    assert(new Web.RetryingClient(always429, retries = 2, initialDelayMs = 1, sleep = _ => ())
      .get("u").status == 429)
  }

  test("download writes {ts}_MeetMax_{id}.xls into the watch dir and reports failures") {
    val watch = Files.createTempDirectory("graft-watch").toString
    val rows = Seq(
      (1L, "https://x/sched/event_1/__co-list_cp.xls?event_id=1"),
      (9L, "https://x/bad")
    ).toDF("eventid", "downloadlink")
    val res = Web
      .download(rows, () => new StubSite, watch, "20250401T120000",
        delayMs = 0, sleep = WebSpec.noSleep)
      .collect()
      .map(r => r.eventid -> r)
      .toMap
    assert(res(1L).status == "OK")
    assert(Files.exists(java.nio.file.Paths.get(watch, "20250401T120000_MeetMax_1.xls")))
    assert(res(9L).status.startsWith("Failed"))
  }

  test("rate limiter enforces inter-request cadence (stubbed sleep, modeled clock)") {
    val waits = scala.collection.mutable.ArrayBuffer.empty[Long]
    val rl = new Web.RateLimiter(5000, sleep = waits += _)
    rl.acquire(); rl.acquire(); rl.acquire()
    // first request free; with a stubbed sleep the modeled next-allowed
    // time keeps advancing, so waits grow by ~5000 per request
    assert(waits.size == 2)
    assert(waits(0) > 0 && waits(0) <= 5000)
    assert(waits(1) > 5000 && waits(1) <= 10000)
  }

  test("PassthroughConverter materializes the CSV beside the XLS") {
    val dir = Files.createTempDirectory("graft-xls")
    val xls = dir.resolve("f.xls")
    Files.write(xls, "A,B\n1,2\n".getBytes)
    val csv = new graft.ingest.PassthroughConverter().toCsv(xls)
    assert(csv.getFileName.toString == "f.csv")
    assert(new String(Files.readAllBytes(csv)) == "A,B\n1,2\n")
  }
}
