package graft.etl

import java.net.InetSocketAddress
import java.time.LocalDate
import java.util.concurrent.atomic.AtomicLong

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}

import org.apache.spark.sql.SparkSession

/** The reference's HTTP control plane (`etl/app/main.py:31-67`) as an
  * actual server, completing the 1:1 surface next to the library facade
  * ([[ShiftsEtl.run]]/[[ShiftsEtl.clear]]):
  *
  *  - `POST /run-etl[?batch_size=N]` — trigger the pipeline against the
  *    configured source API; `batch_size` ∈ [1, 30] is pushed down to
  *    the source as a `limit` query param (S3). 200 on success with
  *    `{"status": "ETL process completed successfully"}`; a fetch /
  *    validation failure maps to 400 with a `detail` field (the
  *    reference's ValueError → HTTPException(400) path,
  *    `main.py:44-49`); anything else is 500.
  *  - `POST /clear-data` — drop all warehouse tables; 200 with
  *    `{"status": "Data cleared successfully"}`, 500 on failure
  *    (`main.py:55-67`).
  *
  * Built on the JDK's `com.sun.net.httpserver` (no added dependency).
  * One ETL run executes at a time (the reference's uvicorn worker runs
  * one processor per request against one Postgres; here the serial
  * executor gives the same single-writer discipline the warehouse
  * commit protocol expects). Each run commits under a fresh
  * `http-<seq>` runId so repeated POSTs append new batches — sequence
  * numbers survive restarts by scanning committed batch ids.
  */
final class EtlServer(
    spark: SparkSession,
    warehouse: ShiftWarehouse,
    apiUrl: String,
    asOfDate: () => LocalDate,
    fetch: String => (org.apache.spark.sql.DataFrame, Option[String])) {

  private var server: HttpServer = _

  // resume after the highest committed http-<seq> so a restarted server
  // never collides with its predecessor's runIds
  private val runSeq = new AtomicLong(
    warehouse.committedBatches
      .flatMap("""^http-(\d+)-""".r.findFirstMatchIn(_))
      .map(_.group(1).toLong)
      .foldLeft(0L)(math.max))

  /** Start listening; returns the bound port (pass port=0 to pick one). */
  def start(port: Int = 8010): Int = synchronized {
    require(server == null, "server already started")
    server = HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)
    server.createContext("/run-etl", post("/run-etl", runEtl))
    server.createContext("/clear-data", post("/clear-data", _ => {
      ShiftsEtl.clear(warehouse)
      (200, """{"status": "Data cleared successfully"}""")
    }))
    server.start()
    server.getAddress.getPort
  }

  def stop(): Unit = synchronized {
    if (server != null) { server.stop(0); server = null }
  }

  private def runEtl(x: HttpExchange): (Int, String) = {
    // request-validation phase: failures here are the CLIENT's (400) —
    // a bad batch_size value or range, mirroring the reference's query
    // validation. Failures after this point are the pipeline's.
    val pages =
      try {
        val batchSize: Option[Int] = Option(x.getRequestURI.getQuery)
          .flatMap(_.split("&").collectFirst {
            case p if p.startsWith("batch_size=") =>
              p.stripPrefix("batch_size=").toInt
          })
        PageSource.pages(apiUrl, pageSize = batchSize)(fetch)
      } catch {
        case e @ (_: IllegalArgumentException | _: NumberFormatException) =>
          throw EtlServer.ClientError(e.getMessage)
      }
    val runId = s"http-${runSeq.incrementAndGet()}"
    ShiftsEtl.run(pages, warehouse, asOfDate(), runId)
    (200, """{"status": "ETL process completed successfully"}""")
  }

  /** POST-only wrapper with the reference's error mapping. */
  private def post(path: String, handler: HttpExchange => (Int, String)): HttpHandler =
    new HttpHandler {
      override def handle(x: HttpExchange): Unit = {
        val (status, body) =
          // HttpServer context matching is longest-PREFIX: without the
          // exact-path check, POST /run-etl2 would run a full ETL
          // (review r6; the reference FastAPI app 404s)
          if (x.getRequestURI.getPath != path)
            (404, """{"detail": "Not Found"}""")
          else if (x.getRequestMethod != "POST")
            (405, """{"detail": "Method Not Allowed"}""")
          else try handler(x)
          catch {
            // clean-failure tier mirrors the reference's ValueError→400:
            // failed fetch and bad batch_size only. Everything else —
            // including warehouse integrity failures (duplicate PK, like
            // the reference's psycopg2 IntegrityError) and Spark
            // infrastructure faults — is a 500 (review r6).
            case e @ (_: PageSource.FetchFailedException |
                      _: EtlServer.ClientError) =>
              (400, s"""{"detail": ${EtlServer.quote(e.getMessage)}}""")
            case e: Exception =>
              (500, s"""{"detail": ${EtlServer.quote(s"ETL process failed: ${e.getMessage}")}}""")
          }
        val b = body.getBytes("UTF-8")
        x.getResponseHeaders.set("Content-Type", "application/json")
        x.sendResponseHeaders(status, b.length)
        x.getResponseBody.write(b)
        x.close()
      }
    }
}

object EtlServer {

  /** A request-validation failure — the only non-fetch 400 tier. */
  private[etl] final case class ClientError(msg: String)
    extends RuntimeException(msg)

  /** Production wiring: live HTTP fetch against `apiUrl`, wall-clock
    * as-of date (the reference's CURRENT_DATE). */
  def apply(spark: SparkSession, warehouse: ShiftWarehouse, apiUrl: String): EtlServer =
    new EtlServer(spark, warehouse, apiUrl,
      () => LocalDate.now(java.time.ZoneOffset.UTC),
      PageSource.httpFetcher(spark))

  private[etl] def quote(s: String): String =
    "\"" + Option(s).getOrElse("").flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
}
