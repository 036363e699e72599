package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.util.control.NonFatal

/** S1: sitemap fetch (bbc_news_dag.py:22-25 `requests.get` with a
  * None-return on non-200; the child-sitemap loop at :47-56).
  *
  * Transport is `java.net.URL#openConnection`, so the SAME code path
  * serves http(s):// on a networked cluster and file:// in this
  * zero-egress build — tests exercise file:// fixtures; nothing else
  * changes when the scheme does. Any transport failure (non-200, missing
  * file, refused connection) yields None, matching the reference's
  * "abort this sitemap, continue the loop" behavior.
  *
  * Scale shape: the sitemap INDEX is tiny (tens of URLs), so the fetch
  * loop is driver-side like the reference's; the fetched documents are
  * then parallelized and every per-document parse (S2, via the native
  * xml_fields expression) runs distributed. A crawl frontier large
  * enough to matter would move the fetch itself into a `mapPartitions`
  * over a URL table — same fetchString, executor-side.
  */
object Fetch {

  /** One URL → body, None on any failure (bad URL, refused connection,
    * non-200 after redirects, connect/read timeout). HttpURLConnection
    * follows same-protocol redirects itself, so a 301/302 chain that
    * lands on a 200 is a success, matching `requests.get`'s default. The
    * timeouts exist because a stalled peer would otherwise hang the
    * driver-side fetch loop forever — the reference inherits requests'
    * no-timeout default and has exactly that exposure.
    */
  def fetchString(url: String, connectTimeoutMs: Int = 10000,
      readTimeoutMs: Int = 30000): Option[String] =
    try {
      val conn = new java.net.URI(url).toURL.openConnection()
      conn.setConnectTimeout(connectTimeoutMs)
      conn.setReadTimeout(readTimeoutMs)
      conn match {
        case h: java.net.HttpURLConnection if h.getResponseCode != 200 =>
          h.disconnect(); None
        case _ =>
          val in = conn.getInputStream
          try Some(new String(in.readAllBytes(), "UTF-8"))
          finally in.close()
      }
    } catch { case NonFatal(_) => None }

  /** Fetch a sitemap list driver-side; failed URLs are dropped (the
    * reference's non-200 skip). Returns (url, content).
    */
  def fetchSitemaps(spark: SparkSession, urls: Seq[String]): DataFrame = {
    import spark.implicits._
    urls.flatMap(u => fetchString(u).map(c => (u, c))).toDF("url", "content")
  }

  /** S2 over fetched content: every <url><loc>/<lastmod> entry of every
    * sitemap as one (loc, lastmod) row — ONE xml_fields scan per
    * document, arrays zipped positionally then exploded. Distributed,
    * map-only.
    */
  def sitemapLinks(fetched: DataFrame): DataFrame =
    fetched
      .select(expr("xml_fields(content, 'loc[]', 'lastmod[]')").as("f"))
      .select(explode(arrays_zip(col("f.c0").as("loc"), col("f.c1").as("lastmod")))
        .as("e"))
      .select(col("e.loc"), col("e.lastmod"))

  /** The DAG's news filter (bbc_news_dag.py:32, O-P1) over parsed links. */
  def newsLinks(fetched: DataFrame): DataFrame =
    sitemapLinks(fetched).filter(col("loc").contains("www.bbc.com/news/"))
}
