package graft.sources

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** S11 HTML report artifact: structure, escaping, row bound. */
class HtmlReportSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("renders a self-contained escaped HTML table") {
    val df = Seq((0, "local", "council <road> & \"school\""),
      (1, "politics", "minister vote")).toDF("topic", "label", "keywords")
    val path = java.nio.file.Files.createTempDirectory("report")
      .resolve("topics.html").toString
    HtmlReport.saveHtml(df, path, "Topics <report>")
    val html = java.nio.file.Files.readString(java.nio.file.Paths.get(path))
    assert(html.startsWith("<!DOCTYPE html>"))
    assert(html.contains("<title>Topics &lt;report&gt;</title>"))
    assert(html.contains("<th>topic</th><th>label</th><th>keywords</th>"))
    assert(html.contains("<td>council &lt;road&gt; &amp; &quot;school&quot;</td>"))
    assert(!html.contains("<road>"), "unescaped cell content leaked")
    assert("<tr>".r.findAllIn(html).size == 3) // header + 2 rows
  }

  test("intertopic map: one bubble + one term panel per topic, self-contained") {
    val coords = Seq((0, -0.12, 0.05, 0.5), (1, 0.1, -0.02, 0.3),
      (2, 0.02, 0.2, 0.2)).toDF("topic", "x", "y", "proportion")
    val relevance = Seq(
      (0, 1, "council", -2.1), (0, 2, "road <b>", -2.5),
      (1, 1, "minister", -1.9), (1, 2, "vote", -2.2),
      (2, 1, "match", -2.0), (2, 2, "league", -2.4)
    ).toDF("topic", "rank", "term", "relevance")
    val path = java.nio.file.Files.createTempDirectory("intertopic")
      .resolve("map.html").toString
    HtmlReport.saveIntertopicHtml(coords, relevance, path, "LDA map <12>")
    val html = java.nio.file.Files.readString(java.nio.file.Paths.get(path))
    assert(html.startsWith("<!DOCTYPE html>"))
    assert(html.contains("<title>LDA map &lt;12&gt;</title>"))
    // one SVG circle and one hidden term panel per topic
    (0 to 2).foreach { t =>
      assert(html.contains(s"""id="c$t""""), s"bubble for topic $t missing")
      assert(html.contains(s"""id="p$t""""), s"panel for topic $t missing")
    }
    assert("<circle".r.findAllIn(html).size == 3)
    assert(html.contains("road &lt;b&gt;"), "term text not escaped")
    // self-contained: no external assets of any kind
    assert(!html.contains("http://") && !html.contains("https://cdn") &&
      !html.contains("<script src"), "artifact must not reference the network")
  }

  test("intertopic map with m22 components embeds the λ-slider payload, escaped") {
    val coords = Seq((0, -0.12, 0.05, 0.6), (1, 0.1, -0.02, 0.4))
      .toDF("topic", "x", "y", "proportion")
    val relevance = Seq((0, 1, "council", -2.1), (1, 1, "minister", -1.9))
      .toDF("topic", "rank", "term", "relevance")
    val components = Seq(
      (0, "council", -2.0, 0.8), (0, "road</script>", -2.5, 1.4),
      (1, "minister", -1.8, 0.9), (1, "vote\"x", -2.2, 1.1)
    ).toDF("topic", "term", "logphi", "loglift")
    val path = java.nio.file.Files.createTempDirectory("intertopic2")
      .resolve("map.html").toString
    HtmlReport.saveIntertopicHtml(coords, relevance, path, "LDA map",
      Some(components))
    val html = java.nio.file.Files.readString(java.nio.file.Paths.get(path))
    // slider controls present and wired to the recompute
    assert(html.contains("""<input id="lam" type="range""""))
    assert(html.contains("lam*r[1]+(1-lam)*r[2]"), "client-side relevance mix missing")
    // both components embedded per topic
    assert(html.contains(""""council",-2.0,0.8""") ||
      html.contains(""""council",-2,0.8"""), "payload row missing")
    // a term containing </script> must not terminate the script block
    assert(!html.contains("road</script>"), "unescaped payload can break the page")
    assert(html.contains("road\\u003c/script>"), "escaped form expected")
    assert(html.contains("""vote\"x"""), "quote escaping expected")
    // still self-contained
    assert(!html.contains("<script src"))
  }

  test("maxRows bounds the report") {
    val df = (1 to 50).map(i => (i, s"row$i")).toDF("id", "v")
    val path = java.nio.file.Files.createTempDirectory("report2")
      .resolve("r.html").toString
    HtmlReport.saveHtml(df.orderBy("id"), path, "t", maxRows = 5)
    val html = java.nio.file.Files.readString(java.nio.file.Paths.get(path))
    assert("<tr>".r.findAllIn(html).size == 6)
  }
}
