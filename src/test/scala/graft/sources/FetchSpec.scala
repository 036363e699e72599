package graft.sources

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** S1 sitemap fetch over the scheme-agnostic transport (file:// here;
  * http(s):// is the same code path on a networked cluster).
  */
class FetchSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def writeSitemap(dir: java.nio.file.Path, name: String,
      entries: Seq[(String, String)]): String = {
    val xml = "<?xml version=\"1.0\"?><urlset>" + entries.map { case (loc, mod) =>
      s"<url><loc>$loc</loc><lastmod>$mod</lastmod></url>"
    }.mkString + "</urlset>"
    val f = dir.resolve(name)
    java.nio.file.Files.writeString(f, xml)
    f.toUri.toString // file:// URL
  }

  test("fetch + parse: every entry of every sitemap becomes a link row") {
    val dir = java.nio.file.Files.createTempDirectory("sitemaps")
    val u1 = writeSitemap(dir, "s1.xml", Seq(
      ("https://www.bbc.com/news/uk-12345678", "2022-08-29T07:00:00Z"),
      ("https://www.bbc.com/sport/football/9", "2022-08-29T07:01:00Z")))
    val u2 = writeSitemap(dir, "s2.xml", Seq(
      ("https://www.bbc.com/news/world-europe-62710530", "2022-08-29T06:26:04Z")))
    val fetched = Fetch.fetchSitemaps(spark, Seq(u1, u2))
    assert(fetched.count() == 2)
    val links = Fetch.sitemapLinks(fetched).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(links == Set(
      ("https://www.bbc.com/news/uk-12345678", "2022-08-29T07:00:00Z"),
      ("https://www.bbc.com/sport/football/9", "2022-08-29T07:01:00Z"),
      ("https://www.bbc.com/news/world-europe-62710530", "2022-08-29T06:26:04Z")))
    // O-P1: the DAG's news filter drops the sport URL
    val news = Fetch.newsLinks(fetched).collect().map(_.getString(0)).toSet
    assert(news == Set("https://www.bbc.com/news/uk-12345678",
      "https://www.bbc.com/news/world-europe-62710530"))
  }

  test("transport failure skips the sitemap, like the reference's non-200 abort") {
    val dir = java.nio.file.Files.createTempDirectory("sitemaps2")
    val good = writeSitemap(dir, "ok.xml",
      Seq(("https://www.bbc.com/news/a-1", "2022-01-01")))
    val missing = dir.resolve("nope.xml").toUri.toString
    assert(Fetch.fetchString(missing).isEmpty)
    val fetched = Fetch.fetchSitemaps(spark, Seq(missing, good))
    assert(fetched.count() == 1)
    assert(Fetch.sitemapLinks(fetched).count() == 1)
  }

  test("unreachable endpoint and malformed URL both yield None, not an exception") {
    // 127.0.0.1:1 — local refused connection, no egress; same code path
    // a dead remote takes
    assert(Fetch.fetchString("http://127.0.0.1:1/sitemap.xml").isEmpty)
    assert(Fetch.fetchString("not a url at all").isEmpty)
    assert(Fetch.fetchString("unknownscheme://x/y").isEmpty)
  }

  test("malformed XML and empty sitemaps fetch fine and parse to zero links") {
    val dir = java.nio.file.Files.createTempDirectory("sitemaps3")
    val garbled = dir.resolve("bad.xml")
    java.nio.file.Files.writeString(garbled,
      "<?xml version=\"1.0\"?><urlset><url><loc>https://www.bbc")
    val empty = dir.resolve("empty.xml")
    java.nio.file.Files.writeString(empty, "<?xml version=\"1.0\"?><urlset></urlset>")
    val fetched = Fetch.fetchSitemaps(spark,
      Seq(garbled.toUri.toString, empty.toUri.toString))
    // transport succeeds for both — content problems are a PARSE concern
    assert(fetched.count() == 2)
    // the forward scan never throws: the truncated <loc> is salvaged
    // best-effort (text to end-of-doc, no lastmod) and the empty set
    // yields nothing
    val links = Fetch.sitemapLinks(fetched).collect()
    assert(links.length == 1)
    assert(links(0).getString(0) == "https://www.bbc" && links(0).isNullAt(1))
    // the partial URL can't satisfy the news filter
    assert(Fetch.newsLinks(fetched).count() == 0)
  }

  test("real HTTP paths on a loopback server: 200, 404, redirect chain, read timeout") {
    val xml = "<?xml version=\"1.0\"?><urlset><url>" +
      "<loc>https://www.bbc.com/news/ok-1</loc><lastmod>2022-01-01</lastmod>" +
      "</url></urlset>"
    val srv = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    def handle(path: String)(f: com.sun.net.httpserver.HttpExchange => Unit): Unit =
      srv.createContext(path, (ex: com.sun.net.httpserver.HttpExchange) =>
        try f(ex) finally ex.close())
    handle("/ok") { ex =>
      val b = xml.getBytes("UTF-8")
      ex.sendResponseHeaders(200, b.length)
      ex.getResponseBody.write(b)
    }
    handle("/gone") { ex => ex.sendResponseHeaders(404, -1) }
    handle("/hop2") { ex =>
      ex.getResponseHeaders.set("Location", "/ok")
      ex.sendResponseHeaders(302, -1)
    }
    handle("/hop1") { ex =>
      ex.getResponseHeaders.set("Location", "/hop2")
      ex.sendResponseHeaders(301, -1)
    }
    handle("/stall") { ex =>
      Thread.sleep(5000) // longer than the probe's read timeout
      ex.sendResponseHeaders(200, -1)
    }
    srv.start()
    try {
      val base = s"http://127.0.0.1:${srv.getAddress.getPort}"
      assert(Fetch.fetchString(s"$base/ok").contains(xml))
      // reference parity (bbc_news_dag.py:22-25): non-200 → None, loop continues
      assert(Fetch.fetchString(s"$base/gone").isEmpty)
      // a 301→302→200 chain is followed to success, like requests.get
      assert(Fetch.fetchString(s"$base/hop1").contains(xml))
      // a stalled peer trips the read timeout instead of hanging the loop
      assert(Fetch.fetchString(s"$base/stall", readTimeoutMs = 300).isEmpty)
      // end-to-end: the failing URLs drop out, the good ones parse
      val fetched = Fetch.fetchSitemaps(spark,
        Seq(s"$base/ok", s"$base/gone", s"$base/hop1"))
      assert(fetched.count() == 2)
      assert(Fetch.newsLinks(fetched).count() == 2)
    } finally srv.stop(0)
  }
}
