package graft

import graft.io.{BarsHttpClient, JsonSource}

/** Offline contract tests for the paginated bars-API client: a scripted
  * fake transport plays a three-page token chain, and the landed pages
  * flow through the REAL scan path (schema-pinned JSON read + map
  * explosion) to prove cross-page reassembly. The reference client
  * (alpaca_api.py:25) ignores next_page_token — it would return only
  * page 1 of this feed; the >1000-bar truncation fix is the point. */
class BarsHttpClientSpec extends SparkSpec {

  import BarsTestFeed.{bar, scripted}

  // pages split MID-SYMBOL, like the real API under a small limit:
  // AAPL spans pages 1-2, MSFT spans pages 2-3
  private val page1 =
    s"""{"bars":{"AAPL":[${bar(10.0, 1, "2024-01-02T05:00:00Z")}]},"next_page_token":"tok1"}"""
  private val page2 =
    s"""{"bars":{"AAPL":[${bar(11.0, 2, "2024-01-03T05:00:00Z")}],"MSFT":[${bar(20.0, 3, "2024-01-02T05:00:00Z")}]},"next_page_token":"tok2"}"""
  private val page3 =
    s"""{"bars":{"MSFT":[${bar(21.0, 4, "2024-01-03T05:00:00Z")}]},"next_page_token":null}"""

  test("follows the next_page_token chain to exhaustion; auth + params on every request") {
    val log = collection.mutable.Buffer.empty[(String, Map[String, String])]
    val client = new BarsHttpClient("key", "secret", scripted(Map(
      None -> ((200, page1)),
      Some("tok1") -> ((200, page2)),
      Some("tok2") -> ((200, page3))), log))
    val pages = client.fetchAllPages("AAPL,MSFT", "1Day", "2024-01-02",
      end = Some("2024-01-05"))
    assert(pages == Seq(page1, page2, page3))
    assert(log.size == 3, "one request per page, stop at null token")
    log.foreach { case (url, headers) =>
      assert(headers == Map("APCA-API-KEY-ID" -> "key",
        "APCA-API-SECRET-KEY" -> "secret"))
      assert(url.contains("limit=1000") && url.contains("timeframe=1Day"))
      assert(url.contains("symbols=AAPL%2CMSFT"))
      assert(url.contains("start=2024-01-02") && url.contains("end=2024-01-05"))
    }
    assert(!log.head._1.contains("page_token"), "first request has no token")
  }

  test("landed pages reassemble across the page split through the real scan path") {
    val log = collection.mutable.Buffer.empty[(String, Map[String, String])]
    val client = new BarsHttpClient("key", "secret", scripted(Map(
      None -> ((200, page1)),
      Some("tok1") -> ((200, page2)),
      Some("tok2") -> ((200, page3))), log))
    val dir = java.nio.file.Files.createTempDirectory("bars_pages").toString + "/pages"
    client.landPages(spark, client.fetchAllPages("AAPL,MSFT", "1Day", "2024-01-02"), dir)
    val rows = JsonSource.readBars(spark, dir)
      .orderBy("stock", "timestamp")
      .collect()
    // 4 bars across 3 pages, both symbols whole despite the mid-symbol
    // page splits — the reference's one-page client would see only 1
    assert(rows.length == 4)
    assert(rows.map(_.getAs[String]("stock")).toSeq ==
      Seq("AAPL", "AAPL", "MSFT", "MSFT"))
    assert(rows.map(_.getAs[Long]("number_of_trades")).toSeq == Seq(1L, 2L, 3L, 4L))
    assert(rows.head.getAs[Double]("open") == 10.0 &&
      rows.head.getAs[Double]("close") == 11.0)
  }

  test("fetchAndLand streams pages to the landing file; partial landings invisible") {
    val log = collection.mutable.Buffer.empty[(String, Map[String, String])]
    val client = new BarsHttpClient("key", "secret", scripted(Map(
      None -> ((200, page1)),
      Some("tok1") -> ((200, page2)),
      Some("tok2") -> ((200, page3))), log))
    val dir = java.nio.file.Files.createTempDirectory("bars_land").toString + "/pages"
    assert(client.fetchAndLand(spark, dir, "AAPL,MSFT", "1Day", "2024-01-02") == 3)
    // committed exactly one VISIBLE file (the local FS adds hidden
    // .crc checksum siblings; scans ignore dot-files) and no visible
    // temp residue
    val files = new java.io.File(dir).listFiles().map(_.getName).toSeq
      .filterNot(_.startsWith("."))
    assert(files == Seq("pages.jsonl"), s"unexpected landing contents: $files")
    assert(JsonSource.readBars(spark, dir).count() == 4)
    // a failing chain leaves NO visible landing (temp cleaned up)
    val dir2 = java.nio.file.Files.createTempDirectory("bars_land2").toString + "/pages"
    intercept[RuntimeException] {
      new BarsHttpClient("k", "s", scripted(Map(
        None -> ((200, page1)),
        Some("tok1") -> ((500, "boom"))), log))
        .fetchAndLand(spark, dir2, "AAPL", "1Day", "2024-01-02")
    }
    val residue = Option(new java.io.File(dir2).listFiles())
      .map(_.map(_.getName).toSeq.filterNot(_.startsWith(".")))
      .getOrElse(Seq.empty)
    assert(residue.isEmpty, s"failed landing left residue: $residue")
  }

  test("pagination property: any page partitioning reassembles the exact bar set") {
    val rnd = new scala.util.Random(11)
    for (_ <- 1 to 5) {
      // a random multi-symbol feed...
      val all: Seq[(String, Long)] = for {
        s <- 0 until (1 + rnd.nextInt(4))
        b <- 0 until (1 + rnd.nextInt(6))
      } yield (s"SYM$s", (s * 100 + b).toLong)
      // ...cut into random pages at arbitrary positions (mid-symbol cuts
      // included — the shape a real limit/token chain produces)
      val cuts = all.indices.drop(1).filter(_ => rnd.nextInt(3) == 0)
      val pageSlices = (Seq(0) ++ cuts :+ all.size).sliding(2).map {
        case Seq(a, b) => all.slice(a, b) }.filter(_.nonEmpty).toSeq
      val pages = pageSlices.zipWithIndex.map { case (slice, i) =>
        val bySym = slice.groupBy(_._1).toSeq.sortBy(_._1).map { case (sym, bs) =>
          s""""$sym":[${bs.map { case (_, n) =>
            bar(10.0 + n, n, f"2024-01-${(n % 27) + 1}%02dT05:00:00Z") }.mkString(",")}]"""
        }.mkString(",")
        val tok = if (i == pageSlices.size - 1) "null" else s""""t${i + 1}""""
        s"""{"bars":{$bySym},"next_page_token":$tok}"""
      }
      val byToken = pages.zipWithIndex.map { case (p, i) =>
        (if (i == 0) None else Some(s"t$i")) -> ((200, p)) }.toMap
      val log = collection.mutable.Buffer.empty[(String, Map[String, String])]
      val client = new BarsHttpClient("k", "s", scripted(byToken, log))
      val dir = java.nio.file.Files.createTempDirectory("bars_prop").toString + "/p"
      assert(client.fetchAndLand(spark, dir, "X", "1Day", "2024-01-01") ==
        pageSlices.size)
      val got = JsonSource.readBars(spark, dir)
        .select("stock", "number_of_trades").collect()
        .map(r => (r.getString(0), r.getLong(1))).toSet
      assert(got == all.toSet,
        s"reassembled feed diverged for cut set $cuts")
    }
  }

  test("error contract: non-200, missing bars, and runaway token chains are loud") {
    val log = collection.mutable.Buffer.empty[(String, Map[String, String])]
    val e1 = intercept[RuntimeException] {
      new BarsHttpClient("k", "s", scripted(Map(None -> ((403, "forbidden"))), log))
        .fetchAllPages("AAPL", "1Day", "2024-01-02")
    }
    assert(e1.getMessage.contains("403"))
    val e2 = intercept[RuntimeException] {
      new BarsHttpClient("k", "s",
        scripted(Map(None -> ((200, """{"message":"ok"}"""))), log))
        .fetchAllPages("AAPL", "1Day", "2024-01-02")
    }
    assert(e2.getMessage.contains("bars"))
    // a server echoing the same token forever must hit maxPages, not hang
    val loopLog = collection.mutable.Buffer.empty[(String, Map[String, String])]
    val e3 = intercept[RuntimeException] {
      new BarsHttpClient("k", "s", scripted(Map(
        None -> ((200, page1)),
        Some("tok1") ->
          ((200, page1.replace("\"tok1\"", "\"tok1\"")))), loopLog))
        .fetchAllPages("AAPL", "1Day", "2024-01-02", maxPages = 5)
    }
    assert(e3.getMessage.contains("5 pages"))
    // the cap bounds SERVER TRAFFIC, not just the loop: the guard runs
    // before the request, so exactly maxPages fetches ever happen
    assert(loopLog.size == 5,
      s"maxPages=5 must mean 5 requests, saw ${loopLog.size}")
    // constructor nulls fail fast, matching the reference
    intercept[IllegalArgumentException] { new BarsHttpClient(null, "s") }
    intercept[IllegalArgumentException] { new BarsHttpClient("k", null) }
  }
}
