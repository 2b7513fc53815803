package graft.etl

import java.time.LocalDate

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The reference's `/run-etl` pipeline as a library call
  * (`etl/app/main.py:31-53` + `process_all_pages`,
  * shift_data_processor.py:185-215).
  *
  * Extract is abstracted as an iterator of page DataFrames (the reference's
  * paginated HTTP fetch is control-plane; see [[PageSource]] for the
  * link-following loop). Each page is normalized and committed atomically —
  * one batch per page, exactly the reference's one-transaction-per-page —
  * then the six KPIs are computed over everything committed and appended.
  */
object ShiftsEtl {

  /** Run the full pipeline. Returns the KPI rows that were committed.
    *
    * @param pages     one DataFrame (schema [[ShiftSchemas.pageSchema]]) per
    *                  source page
    * @param warehouse target warehouse
    * @param asOfDate  the reference's CURRENT_DATE, injected for determinism
    * @param runId     prefix for batch ids (page i commits as `<runId>-p<i>`)
    */
  def run(
      pages: Iterator[DataFrame],
      warehouse: ShiftWarehouse,
      asOfDate: LocalDate,
      runId: String = "run"): DataFrame = {
    pages.zipWithIndex.foreach { case (page, i) =>
      warehouse.appendBatch(ShiftNormalizer.normalize(page), f"$runId-p$i%05d")
    }
    val kpis = ShiftKpis.all(warehouse.normalized, asOfDate)
    warehouse.appendKpis(kpis, s"$runId-kpis")
    warehouse.kpis
  }

  /** `/clear-data` (etl/app/main.py:55-67). */
  def clear(warehouse: ShiftWarehouse): Unit = warehouse.clear()
}

/** Pagination source driver (S2, shift_data_processor.py:146-152,185-215):
  * follow `links.next` (resolved against the base URL) until absent, yielding
  * one page per fetch. Fetching is injected — in production an HTTP client,
  * in tests a map of canned payloads.
  */
object PageSource {

  /** Resolve the possibly-relative `links.next` against the base URL, as
    * `urljoin` does in the reference (get_next_url,
    * shift_data_processor.py:146-152). */
  def resolveNext(baseUrl: String, next: Option[String]): Option[String] =
    next.map(n => java.net.URI.create(baseUrl).resolve(n).toString)

  /** Iterate pages from `firstUrl`, following next-links.
    *
    * @param fetch url → (page DataFrame, raw next link if any)
    */
  def pages(firstUrl: String)(fetch: String => (DataFrame, Option[String])): Iterator[DataFrame] =
    new Iterator[DataFrame] {
      private var nextUrl: Option[String] = Some(firstUrl)
      def hasNext: Boolean = nextUrl.isDefined
      def next(): DataFrame = {
        val url = nextUrl.get
        val (df, rawNext) = fetch(url)
        nextUrl = resolveNext(url, rawNext)
        df
      }
    }

  /** Parse one JSON page payload (the reference's `response.json()`) into a
    * typed page DataFrame with the declared schema — never inferred. */
  def parsePage(spark: SparkSession, json: String): DataFrame = {
    import spark.implicits._
    spark.read.schema(ShiftSchemas.pageSchema).json(Seq(json).toDS())
  }
}
