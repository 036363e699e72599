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
}
