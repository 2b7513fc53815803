package graft.etl

import java.net.{HttpURLConnection, URI}
import java.time.LocalDate

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}

import graft.SparkTestBase

/** The HTTP control plane end-to-end over real sockets: a fixture "shifts
  * API" serves the reference's paginated payloads; the EtlServer is
  * driven with actual POSTs (`/run-etl`, `/clear-data`) and the
  * warehouse + response codes/bodies are asserted — the reference's
  * `etl/app/main.py` surface, 1:1. */
class EtlServerSpec extends SparkTestBase {

  private def post(url: String): (Int, String) = {
    val conn = URI.create(url).toURL.openConnection().asInstanceOf[HttpURLConnection]
    conn.setRequestMethod("POST")
    conn.setConnectTimeout(10000)
    conn.setReadTimeout(120000)
    val code = conn.getResponseCode
    val stream = if (code >= 400) conn.getErrorStream else conn.getInputStream
    val body = try new String(stream.readAllBytes(), "UTF-8") finally conn.disconnect()
    (code, body)
  }

  private def withFixtureApi(f: String => Unit): Unit = {
    val api = HttpServer.create(new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    def serve(path: String, body: String): Unit =
      api.createContext(path, new HttpHandler {
        override def handle(x: HttpExchange): Unit = {
          val b = body.getBytes("UTF-8")
          x.sendResponseHeaders(200, b.length)
          x.getResponseBody.write(b)
          x.close()
        }
      })
    val p1 = ShiftFixtures.page1.replace("/api/shifts?start=1&limit=1", "/page2")
    serve("/page1", p1)
    serve("/page2", ShiftFixtures.page2)
    api.start()
    try f(s"http://127.0.0.1:${api.getAddress.getPort}")
    finally api.stop(0)
  }

  test("POST /run-etl ingests all pages, POST /clear-data empties the warehouse") {
    withFixtureApi { base =>
      val wh = new ShiftWarehouse(spark, tempDir("etl-server"))
      val srv = new EtlServer(spark, wh, s"$base/page1",
        () => LocalDate.parse("2023-12-31"), PageSource.httpFetcher(spark))
      val port = srv.start(port = 0)
      try {
        val (code, body) = post(s"http://127.0.0.1:$port/run-etl")
        assert(code == 200, body)
        assert(body == """{"status": "ETL process completed successfully"}""")
        assert(wh.shifts.count() == 2)
        assert(wh.breaks.count() == 2)
        assert(wh.kpis.count() > 0)

        // re-running against already-loaded data violates the PK like the
        // reference's plain INSERT (shift_data_processor.py:124-144,
        // psycopg2 IntegrityError → generic 500) — warehouse unchanged
        val (code2, body2) = post(s"http://127.0.0.1:$port/run-etl")
        assert(code2 == 500, body2)
        assert(body2.contains("duplicate key"), body2)
        assert(wh.shifts.count() == 2)

        val (code3, body3) = post(s"http://127.0.0.1:$port/clear-data")
        assert(code3 == 200)
        assert(body3 == """{"status": "Data cleared successfully"}""")
        assert(wh.shifts.count() == 0 && wh.kpis.count() == 0)

        // after a clear, ingest works again under a fresh http-<seq> runId
        val (code4, _) = post(s"http://127.0.0.1:$port/run-etl")
        assert(code4 == 200)
        assert(wh.shifts.count() == 2)
      } finally srv.stop()
    }
  }

  test("batch_size is pushed down as the source limit param; invalid values are 400") {
    withFixtureApi { base =>
      var urls = List.empty[String]
      val wh = new ShiftWarehouse(spark, tempDir("etl-server-bs"))
      val inner = PageSource.httpFetcher(spark)
      val srv = new EtlServer(spark, wh, s"$base/page1",
        () => LocalDate.parse("2023-12-31"),
        url => { urls ::= url; inner(url) })
      val port = srv.start(port = 0)
      try {
        val (code, _) = post(s"http://127.0.0.1:$port/run-etl?batch_size=7")
        assert(code == 200)
        assert(urls.last == s"$base/page1?limit=7", urls) // first fetch carries the pushdown

        val (code2, body2) = post(s"http://127.0.0.1:$port/run-etl?batch_size=31")
        assert(code2 == 400, body2)
        assert(body2.contains("pageSize must be in [1,30]"), body2)

        val (code3, _) = post(s"http://127.0.0.1:$port/run-etl?batch_size=abc")
        assert(code3 == 400)
      } finally srv.stop()
    }
  }

  test("a dead upstream maps to 400 with detail; GET is 405") {
    val wh = new ShiftWarehouse(spark, tempDir("etl-server-err"))
    val srv = new EtlServer(spark, wh, "http://127.0.0.1:1/nope",
      () => LocalDate.parse("2023-12-31"), PageSource.httpFetcher(spark))
    val port = srv.start(port = 0)
    try {
      val (code, body) = post(s"http://127.0.0.1:$port/run-etl")
      assert(code == 400, body)
      assert(body.contains("Failed to fetch data"), body)
      assert(wh.shifts.count() == 0, "nothing may be committed on a failed run")

      val conn = URI.create(s"http://127.0.0.1:$port/run-etl").toURL
        .openConnection().asInstanceOf[HttpURLConnection]
      conn.setRequestMethod("GET")
      assert(conn.getResponseCode == 405)
      conn.disconnect()

      // prefix-matched paths must NOT trigger a run (HttpServer contexts
      // match by longest prefix; the reference 404s)
      val (code404, _) = post(s"http://127.0.0.1:$port/run-etl2")
      assert(code404 == 404)
      val (code404b, _) = post(s"http://127.0.0.1:$port/run-etl/x")
      assert(code404b == 404)
    } finally srv.stop()
  }
}
