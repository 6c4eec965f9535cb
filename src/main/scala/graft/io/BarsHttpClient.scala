package graft.io

import com.fasterxml.jackson.databind.ObjectMapper

/** S1's live half: the bars-API HTTP client (reference:
  * etl_project/connectors/alpaca_api.py:18-39).
  *
  * Two deliberate departures from the reference:
  *  - **Pagination.** The bars API returns at most `limit` bars per
  *    response plus a `next_page_token`; the reference sends `limit=1000`
  *    and never reads the token (alpaca_api.py:25), silently truncating
  *    any symbol/date range past 1000 bars. This client follows the
  *    token chain to exhaustion (with a `maxPages` runaway guard).
  *  - **Transport injection.** The HTTP call is a plain function
  *    `(url, headers) => (status, body)`, so the client unit-tests
  *    offline with a scripted fake and swaps in any real stack in
  *    production; [[BarsHttpClient.urlConnectionTransport]] is a
  *    dependency-free default built on `java.net.HttpURLConnection`.
  *
  * Scale contract: the client is DRIVER-SIDE INGEST PLUMBING — it never
  * parses bars. Each page body lands verbatim as one line of a text
  * file; parsing, the symbol-map explosion, and the cross-page union
  * all happen inside the distributed JSON scan ([[JsonSource.readBars]]
  * — the pinned-schema read ignores the extra `next_page_token` field).
  * Backfills stream page-at-a-time to the landing file (`fetchAndLand`,
  * O(1) pages in driver memory); `fetchAllPages` materializes and is
  * for bounded ranges and tests.
  */
object BarsHttpClient {

  /** (url, headers) => (statusCode, body). */
  type Transport = (String, Map[String, String]) => (Int, String)

  /** Dependency-free real transport. Never exercised in the offline
    * test environment; kept trivially thin so the fake covers all
    * client logic. */
  val urlConnectionTransport: Transport = (url, headers) => {
    val conn = new java.net.URL(url).openConnection()
      .asInstanceOf[java.net.HttpURLConnection]
    headers.foreach { case (k, v) => conn.setRequestProperty(k, v) }
    conn.setConnectTimeout(30000)
    conn.setReadTimeout(30000)
    val status = conn.getResponseCode
    val stream = if (status >= 400) conn.getErrorStream else conn.getInputStream
    val body = if (stream == null) "" else
      try scala.io.Source.fromInputStream(stream, "UTF-8").mkString
      finally stream.close()
    (status, body)
  }

  final case class Page(body: String, nextPageToken: Option[String])

  private val mapper = new ObjectMapper()

  /** Parse the two control fields the CLIENT needs from a page body:
    * presence of `bars` (an absent/null map is an API error per the
    * reference's contract) and the pagination token. The bars content
    * itself stays an opaque string for the Spark scan. */
  private[io] def parsePage(body: String): Either[String, Page] = {
    val root =
      try mapper.readTree(body)
      catch { case e: Exception => return Left(s"unparseable body: ${e.getMessage}") }
    val bars = root.get("bars")
    if (bars == null || bars.isNull) Left("response has no 'bars' field")
    else {
      val tok = Option(root.get("next_page_token"))
        .filterNot(_.isNull).map(_.asText).filter(_.nonEmpty)
      Right(Page(body, tok))
    }
  }
}

/** @param apiKeyId / apiSecretKey: fail-fast on null, matching the
  *   reference's constructor contract (alpaca_api.py:10-16). */
final class BarsHttpClient(
    apiKeyId: String,
    apiSecretKey: String,
    transport: BarsHttpClient.Transport = BarsHttpClient.urlConnectionTransport,
    baseUrl: String = "https://data.alpaca.markets/v2/stocks/bars",
    pageLimit: Int = 1000) {
  import BarsHttpClient._

  require(apiKeyId != null, "API key cannot be set to None.")
  require(apiSecretKey != null, "API secret key cannot be set to None.")

  private val headers = Map(
    "APCA-API-KEY-ID" -> apiKeyId,
    "APCA-API-SECRET-KEY" -> apiSecretKey)

  private def enc(s: String) =
    java.net.URLEncoder.encode(s, "UTF-8")

  private def url(symbols: String, timeframe: String, start: String,
                  end: Option[String], pageToken: Option[String]): String = {
    val params = Seq(
      "limit" -> pageLimit.toString, "adjustment" -> "raw",
      "feed" -> "sip", "sort" -> "asc",
      "symbols" -> symbols, "timeframe" -> timeframe, "start" -> start) ++
      end.map("end" -> _) ++ pageToken.map("page_token" -> _)
    baseUrl + "?" + params.map { case (k, v) => s"$k=${enc(v)}" }.mkString("&")
  }

  /** Walk the token chain, handing each page body to `f` as it arrives
    * — ONE page in driver memory at a time, the property that makes
    * multi-year backfills (the very case the pagination fix exists for)
    * O(1) instead of O(total feed bytes). Throws on any non-200 page or
    * a page with no `bars` (the reference's error contract, per page),
    * and on a token chain longer than `maxPages` (a defensive bound — a
    * buggy server echoing the same token forever must not hang ingest).
    * Returns the page count. */
  def foreachPage(symbols: String, timeframe: String, start: String,
                  end: Option[String] = None, maxPages: Int = 10000)
                 (f: String => Unit): Int = {
    var token: Option[String] = None
    var pages = 0
    while ({
      // guard BEFORE the request: exactly maxPages pages are ever
      // fetched (and handed to f) — the cap bounds server traffic,
      // not just the loop
      if (pages >= maxPages)
        throw new RuntimeException(
          s"bars API pagination exceeded $maxPages pages — token chain " +
            "is not terminating (server bug or maxPages set too low)")
      val u = url(symbols, timeframe, start, end, token)
      val (status, body) = transport(u, headers)
      val page = (if (status == 200) parsePage(body) else Left(body))
        .fold(err => throw new RuntimeException(
          s"Failed to extract data from bars API. Status Code: $status. " +
            s"Response: $err"), identity)
      f(page.body)
      pages += 1
      token = page.nextPageToken
      token.isDefined
    }) ()
    pages
  }

  /** All pages materialized in memory — fine for bounded ranges and
    * tests; backfills should stream via [[fetchAndLand]]. */
  def fetchAllPages(symbols: String, timeframe: String, start: String,
                    end: Option[String] = None,
                    maxPages: Int = 10000): Seq[String] = {
    val out = Seq.newBuilder[String]
    foreachPage(symbols, timeframe, start, end, maxPages)(out += _)
    out.result()
  }

  /** Fetch + land in ONE streaming pass: each page body goes straight
    * to a line of `path`/`fileName` as it arrives (written to a hidden
    * temp name, renamed into place on success, so readers never see a
    * partial landing). Any Hadoop filesystem. Returns the page count;
    * the landed dir is ready for [[JsonSource.readBars]]. Newlines
    * inside a body would corrupt line framing, so they are rejected
    * loudly.
    *
    * Give each fetch a DISTINCT `fileName` when the landing dir feeds a
    * streaming reader ([[graft.streaming.BarsStream]]): Spark's file
    * source tracks processed files BY NAME, so re-landing over an
    * already-processed name makes the new fetch invisible to the
    * stream. */
  def fetchAndLand(spark: org.apache.spark.sql.SparkSession, path: String,
                   symbols: String, timeframe: String, start: String,
                   end: Option[String] = None, maxPages: Int = 10000,
                   fileName: String = "pages.jsonl"): Int = {
    val dir = new org.apache.hadoop.fs.Path(path)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(dir)
    val tmp = new org.apache.hadoop.fs.Path(dir, "." + fileName + ".tmp")
    val dst = new org.apache.hadoop.fs.Path(dir, fileName)
    val out = new java.io.BufferedWriter(new java.io.OutputStreamWriter(
      fs.create(tmp, true), java.nio.charset.StandardCharsets.UTF_8))
    val n =
      try {
        val pages = foreachPage(symbols, timeframe, start, end, maxPages) { body =>
          require(!body.contains("\n"),
            "page bodies must be single-line JSON documents")
          out.write(body); out.write("\n")
        }
        out.close()
        pages
      } catch {
        case e: Throwable =>
          // close may throw AGAIN (its flush hits the same disk-full /
          // dead-FS condition) — it must neither mask the root cause
          // nor skip the tmp cleanup
          try out.close() catch { case _: Throwable => () }
          try { fs.delete(tmp, false); () } catch { case _: Throwable => () }
          throw e
      }
    if (fs.exists(dst)) fs.delete(dst, false)
    if (!fs.rename(tmp, dst))
      throw new RuntimeException(s"could not commit landed pages to $dst")
    n
  }

  /** Land already-fetched pages as a line-delimited text file (one page
    * body per line — page bodies are single-line JSON documents) and
    * return the path, ready for [[JsonSource.readBars]]. */
  def landPages(spark: org.apache.spark.sql.SparkSession,
                pages: Seq[String], path: String): String = {
    require(pages.forall(!_.contains("\n")),
      "page bodies must be single-line JSON documents")
    import spark.implicits._
    spark.createDataset(pages).toDF("value")
      .coalesce(1).write.mode("overwrite").text(path)
    path
  }
}
