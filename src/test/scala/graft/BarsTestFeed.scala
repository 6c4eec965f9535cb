package graft

import graft.io.BarsHttpClient

/** Shared scripted-transport fixtures for bars-API tests: ONE copy of
  * the page_token URL parse and the single-line bar JSON template, so a
  * change to the client's URL encoding or the raw bar schema is a
  * single edit. (PipelineDemo keeps its own inline copy on purpose —
  * it is self-contained example code for adopters.) */
object BarsTestFeed {

  /** Raw API bar document with close = open + 1 and volume = n * 10. */
  def bar(o: Double, n: Long, t: String): String =
    s"""{"c":${o + 1},"h":$o,"l":$o,"n":$n,"o":$o,"t":"$t","v":${n * 10},"vw":$o}"""

  /** Transport that serves `pages` keyed by the request's page_token
    * (None = first request) and records every (url, headers) call. */
  def scripted(pages: Map[Option[String], (Int, String)],
               log: collection.mutable.Buffer[(String, Map[String, String])] =
                 collection.mutable.Buffer.empty)
      : BarsHttpClient.Transport = (url, headers) => {
    log += ((url, headers))
    pages("(?:\\?|&)page_token=([^&]+)".r
      .findFirstMatchIn(url).map(_.group(1)))
  }
}
