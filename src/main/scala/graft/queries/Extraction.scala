package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.collection.immutable.ListMap

/** S2 (XML sitemap parse) + S9 (HTML field extraction) — the reference's
  * ingestion-side parsers (bbc_news_dag.py:28-34 BeautifulSoup <loc>/
  * <lastmod> extraction; ArticlesSpider.py:18-33 CSS/XPath field
  * extraction), re-expressed with Spark's built-in Hive xpath_* SQL
  * functions over markup-bearing string columns.
  *
  * The fixtures carry no markup, so each query SYNTHESIZES a
  * deterministic document from fixture fields first (that projection is
  * not the operator under test) and then runs the real extraction
  * expressions. The DuckDB oracle re-synthesizes the same string and
  * extracts with regexes — equivalent on this well-formed shape, so both
  * queries are fully value-checked.
  *
  * Extraction uses the native `xml_fields` expression
  * (expressions/XmlFields.scala): ONE scan of the document yields every
  * requested field as a struct. Round 2 used Hive's xpath_* here, which
  * DOM-parses the document once per FIELD per row (and again when the
  * optimizer substitutes the alias into a pushed-down filter) — 667 s at
  * sf0.1 for 5k docs; the single-scan struct form is map-only and ~µs/row.
  *
  * Scale: per-row scalar expression — map-only, no shuffle; a 100 TB
  * crawl archive parses embarrassingly parallel.
  */
object Extraction {

  type Q = (SparkSession, String) => DataFrame

  /** X1/S2: sitemap <url><loc>…</loc><lastmod>…</lastmod></url> parse +
    * the news-URL substring predicate (O-P1, bbc_news_dag.py:32).
    */
  def x1SitemapParse(s: SparkSession, dir: String): DataFrame = {
    val xml = concat(
      lit("<url><loc>https://www.bbc.com/"),
      when(col("doc_id") % 3 === 0, lit("sport/")).otherwise(lit("news/")),
      col("source"), lit("-"), col("doc_id").cast("string"),
      lit("</loc><lastmod>2022-0"), ((col("doc_id") % 9) + 1).cast("string"),
      lit("-15T12:00:00Z</lastmod></url>"))
    Tables.documents(s, dir)
      .select(col("doc_id"), xml.as("xml"))
      .select(col("doc_id"), expr("xml_fields(xml, 'loc', 'lastmod')").as("f"))
      .select(col("doc_id"), col("f.c0").as("loc"), col("f.c1").as("lastmod"))
      .filter(col("loc").contains("www.bbc.com/news/"))
      .orderBy(col("doc_id"))
  }

  val x1Sql: String =
    """WITH synth AS (
      |  SELECT doc_id,
      |    '<url><loc>https://www.bbc.com/' ||
      |    CASE WHEN doc_id % 3 = 0 THEN 'sport/' ELSE 'news/' END ||
      |    source || '-' || doc_id ||
      |    '</loc><lastmod>2022-0' || (doc_id % 9) + 1 ||
      |    '-15T12:00:00Z</lastmod></url>' AS xml
      |  FROM documents
      |)
      |SELECT doc_id,
      |  regexp_extract(xml, '<loc>(.*?)</loc>', 1) AS loc,
      |  regexp_extract(xml, '<lastmod>(.*?)</lastmod>', 1) AS lastmod
      |FROM synth
      |WHERE contains(regexp_extract(xml, '<loc>(.*?)</loc>', 1), 'www.bbc.com/news/')
      |ORDER BY doc_id""".stripMargin

  /** X2/S9 + O-P11: HTML page field extraction — headline from
    * //h1[@id='main-heading'], timestamp attribute from //time/@datetime,
    * paragraph texts as an array, then ' '.join(paragraphs[:-1])
    * (ArticlesSpider.py:22,26-28).
    */
  def x2HtmlExtract(s: SparkSession, dir: String): DataFrame = {
    val headline = regexp_replace(substring(col("text"), 1, 40), "\\s+$", "")
    val html = concat(
      lit("<html><body><h1 id=\"main-heading\">"), headline,
      lit("</h1><time datetime=\"2022-06-0"), ((col("doc_id") % 9) + 1).cast("string"),
      lit("\"></time><p>alpha "), col("doc_id").cast("string"),
      lit("</p><p>beta "), col("source"),
      lit("</p><p>footer</p></body></html>"))
    Tables.documents(s, dir)
      .filter(!col("text").contains("<") && !col("text").contains("&"))
      .select(col("doc_id"), html.as("html"))
      .select(col("doc_id"),
        expr("xml_fields(html, 'h1#main-heading', 'time@datetime', 'p[]')")
          .as("f"))
      // drop-last ' '.join (ArticlesSpider.py:28 paragraphs[:-1]); the
      // repeated f.c2 references share ONE xml_fields scan via
      // per-operator subexpression elimination
      .select(col("doc_id"), col("f.c0").as("title"), col("f.c1").as("published"),
        array_join(
          slice(col("f.c2"), lit(1), greatest(size(col("f.c2")) - 1, lit(0))),
          " ").as("body"))
      .orderBy(col("doc_id"))
  }

  val x2Sql: String =
    """WITH synth AS (
      |  SELECT doc_id,
      |    regexp_replace(substr(text, 1, 40), '\s+$', '') AS title,
      |    '2022-06-0' || (doc_id % 9) + 1 AS published,
      |    ['alpha ' || doc_id, 'beta ' || source] AS kept_paras
      |  FROM documents
      |  WHERE NOT contains(text, '<') AND NOT contains(text, '&')
      |)
      |SELECT doc_id, title, published,
      |       array_to_string(kept_paras, ' ') AS body
      |FROM synth ORDER BY doc_id""".stripMargin

  /** X3: crawl-frontier URL canonicalization + dedup
    * ([[graft.functions.TextFunctions.canonicalUrl]]) — the pass a crawl
    * pipeline runs before the frontier anti-join (S7) and before page-
    * level dedup, so `HTTPS://WWW.x.COM:443/a/?b=2&a=1#f` and
    * `https://x.com/a?a=1&b=2` count as ONE page. Following x1/x2's
    * doctrine the fixture synthesizes three messy variants per document
    * (tracking params, shuffled query order, uppercase authority,
    * default port, trailing slash, fragment) and the REAL operator —
    * canonicalize, group, count variants, min-id representative — runs
    * distributed: map-only scalar chain + one map-side-combined groupBy
    * whose shuffle carries canonical strings and counts, never pages.
    */
  def x3UrlCanonical(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.TextFunctions.canonicalUrl
    val base = concat(col("source"), lit("/"), col("doc_id").cast("string"))
    val variants = array(
      concat(lit("HTTPS://WWW.Example.COM:443/news/"), base,
        lit("/?utm_source=feed&b=2&a=1#frag")),
      concat(lit("https://www.example.com/news/"), base, lit("?a=1&b=2")),
      concat(lit("https://example.com/news/"), base,
        lit("?b=2&ref=home&a=1#x")))
    Tables.documents(s, dir)
      .select(col("doc_id"), explode(variants).as("url"))
      .select(col("doc_id"), canonicalUrl(col("url")).as("canon_url"))
      .groupBy(col("canon_url"))
      .agg(count(lit(1)).as("n_variants"), min(col("doc_id")).as("first_id"))
      .orderBy(col("canon_url"))
  }

  val x3Sql: String =
    """WITH urls AS (
      |  SELECT doc_id, unnest([
      |    'HTTPS://WWW.Example.COM:443/news/' || source || '/' || doc_id || '/?utm_source=feed&b=2&a=1#frag',
      |    'https://www.example.com/news/' || source || '/' || doc_id || '?a=1&b=2',
      |    'https://example.com/news/' || source || '/' || doc_id || '?b=2&ref=home&a=1#x'
      |  ]) AS url FROM documents
      |),
      |s1 AS (SELECT doc_id, regexp_replace(url, '#.*$', '') AS nofrag FROM urls),
      |s2 AS (SELECT *, regexp_extract(nofrag, '^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*') AS auth FROM s1),
      |s3 AS (SELECT *,
      |  regexp_replace(regexp_replace(regexp_replace(lower(auth),
      |    '^(https?://)www\.', '\1'),
      |    '^(https://[^/:]+):443$', '\1'),
      |    '^(http://[^/:]+):80$', '\1') AS auth_c,
      |  substr(nofrag, length(auth) + 1) AS rest FROM s2),
      |s4 AS (SELECT *,
      |  regexp_replace(CASE WHEN contains(rest, '?') THEN substr(rest, 1, strpos(rest, '?') - 1) ELSE rest END, '/+$', '') AS path_c,
      |  CASE WHEN contains(rest, '?') THEN substr(rest, strpos(rest, '?') + 1) ELSE '' END AS q FROM s3),
      |s5 AS (SELECT *,
      |  array_to_string(list_sort(list_filter(string_split(q, '&'),
      |    x -> length(x) > 0 AND NOT regexp_matches(x, '^(utm_[A-Za-z0-9_]*|fbclid|gclid|ref)='))), '&') AS q_c
      |  FROM s4)
      |SELECT auth_c || path_c || CASE WHEN length(q_c) > 0 THEN '?' || q_c ELSE '' END AS canon_url,
      |       count(*) AS n_variants, min(doc_id) AS first_id
      |FROM s5 GROUP BY 1 ORDER BY 1""".stripMargin

  val queries: ListMap[String, Q] = ListMap(
    "x1_sitemap_parse" -> (x1SitemapParse _),
    "x2_html_extract" -> (x2HtmlExtract _),
    "x3_url_canonical" -> (x3UrlCanonical _),
  )

  val oracle: ListMap[String, String] = ListMap(
    "x1_sitemap_parse" -> x1Sql,
    "x2_html_extract" -> x2Sql,
    "x3_url_canonical" -> x3Sql,
  )
}
