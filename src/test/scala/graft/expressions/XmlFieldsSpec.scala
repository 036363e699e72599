package graft.expressions

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Single-scan xml_fields extraction vs hand-read documents. */
class XmlFieldsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def extract(doc: String, specs: String*): Seq[Any] = {
    val cols = specs.indices.map(i => s"f.c$i")
    Seq(doc).toDF("doc")
      .selectExpr(s"xml_fields(doc, ${specs.map("'" + _ + "'").mkString(", ")}) AS f")
      .selectExpr(cols: _*)
      .collect()(0).toSeq
  }

  test("sitemap loc/lastmod text extraction") {
    val xml = "<url><loc>https://bbc.com/news/x-1</loc>" +
      "<lastmod>2022-01-15T12:00:00Z</lastmod></url>"
    assert(extract(xml, "loc", "lastmod") ==
      Seq("https://bbc.com/news/x-1", "2022-01-15T12:00:00Z"))
  }

  test("attribute, id-qualified tag, and tag[] array in one scan") {
    val html = "<html><body><h1 id=\"main-heading\">Title here</h1>" +
      "<h1 id=\"other\">decoy</h1>" +
      "<time datetime=\"2022-06-03\"></time>" +
      "<p>one</p><p>two</p><p>footer</p></body></html>"
    val out = extract(html, "h1#main-heading", "time@datetime", "p[]")
    assert(out(0) == "Title here")
    assert(out(1) == "2022-06-03")
    assert(out(2).asInstanceOf[scala.collection.Seq[String]] == Seq("one", "two", "footer"))
  }

  test("absent fields yield empty string / empty array (xpath_string parity)") {
    val out = extract("<a>hi</a>", "b", "a@x", "c[]")
    assert(out(0) == "" && out(1) == "")
    assert(out(2).asInstanceOf[scala.collection.Seq[String]].isEmpty)
  }

  test("entities decoded, comments/PI/self-closing tags skipped") {
    val xml = "<?xml version=\"1.0\"?><!-- <loc>fake</loc> --><root>" +
      "<loc>a &amp; b &lt;c&gt;</loc><img src='x'/><loc>second</loc></root>"
    assert(extract(xml, "loc") == Seq("a & b <c>"))
    assert(extract(xml, "loc[]").head
      .asInstanceOf[scala.collection.Seq[String]] == Seq("a & b <c>", "second"))
  }

  test("single-quoted attributes and attr-name prefix collisions") {
    val xml = "<t data-id='no' id='yes'>text</t>"
    assert(extract(xml, "t@id") == Seq("yes"))
  }

  test("unquoted attribute values; self-closing slash is not part of the value") {
    assert(extract("<t a=1/>", "t@a") == Seq("1"))
    assert(extract("<t a=1 b=2>x</t>", "t@a") == Seq("1"))
    assert(extract("<t a=1 b=2>x</t>", "t@b") == Seq("2"))
  }

  test("attribute names inside quoted VALUES are never matched") {
    // the tokenizer skips quoted spans wholesale — a value that embeds
    // `datetime='trap'` text cannot satisfy a datetime lookup
    val xml = "<t title=\"datetime='trap'\" datetime=\"2024-01-01\">x</t>"
    assert(extract(xml, "t@datetime") == Seq("2024-01-01"))
    // and when the real attribute is absent, the embedded text still
    // doesn't count as a hit
    val xml2 = "<t title=\"datetime='trap'\">x</t>"
    assert(extract(xml2, "t@datetime") == Seq(""))
  }
}
