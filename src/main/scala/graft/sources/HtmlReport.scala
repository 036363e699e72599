package graft.sources

import org.apache.spark.sql.DataFrame

/** S11: HTML report sink — the reference publishes its topic model as a
  * self-contained HTML artifact (`pyLDAvis.save_html`,
  * topic_modelling.ipynb lines 625/635; committed as
  * ldaplot_topics_12.html). The engine-side equivalent renders a
  * DataFrame (the report's underlying table — topic keywords m3, or the
  * ldavis payload m7) into one standalone HTML file.
  *
  * Driver-side by design: a report input is a bounded aggregate (topics
  * × top terms, never row-scale data), enforced by `maxRows`. The
  * distributed work happened upstream in the query that produced `df`.
  */
object HtmlReport {

  private def esc(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
      .replace("\"", "&quot;")

  /** Render df (≤ maxRows) as a single-file HTML table report. */
  def saveHtml(df: DataFrame, path: String, title: String,
      maxRows: Int = 1000): Unit = {
    val cols = df.columns
    val rows = df.limit(maxRows).collect()
    val sb = new StringBuilder
    sb ++= "<!DOCTYPE html>\n<html><head><meta charset=\"utf-8\"/><title>"
    sb ++= esc(title)
    sb ++= "</title><style>table{border-collapse:collapse}td,th{border:1px solid #999;padding:4px 8px}</style></head><body>\n"
    sb ++= s"<h1>${esc(title)}</h1>\n<table>\n<tr>"
    cols.foreach(c => sb ++= s"<th>${esc(c)}</th>")
    sb ++= "</tr>\n"
    rows.foreach { r =>
      sb ++= "<tr>"
      cols.indices.foreach { i =>
        sb ++= s"<td>${esc(Option(r.get(i)).map(_.toString).getOrElse(""))}</td>"
      }
      sb ++= "</tr>\n"
    }
    sb ++= "</table></body></html>\n"
    java.nio.file.Files.writeString(java.nio.file.Paths.get(path), sb.toString)
  }
}
