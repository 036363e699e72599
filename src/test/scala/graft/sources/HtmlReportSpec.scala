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

  test("maxRows bounds the report") {
    val df = (1 to 50).map(i => (i, s"row$i")).toDF("id", "v")
    val path = java.nio.file.Files.createTempDirectory("report2")
      .resolve("r.html").toString
    HtmlReport.saveHtml(df.orderBy("id"), path, "t", maxRows = 5)
    val html = java.nio.file.Files.readString(java.nio.file.Paths.get(path))
    assert("<tr>".r.findAllIn(html).size == 6)
  }
}
