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

  /** JS string literal escape for embedded payloads: backslash, quote,
    * newlines, and `<` (so no `</script>` can terminate the block).
    */
  private def jsEsc(s: String): String =
    s.flatMap {
      case '\\' => "\\\\"
      case '"' => "\\\""
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '<' => "\\u003c"
      case c => c.toString
    }

  /** S11, pyLDAvis parity: the intertopic distance map (left panel) plus
    * per-topic relevance term bars (right panel) as ONE self-contained
    * HTML file — inline SVG and a few lines of vanilla JS for topic
    * selection, no external assets, filling the role of the reference's
    * committed ldaplot_topics_12.html (topic_modelling.ipynb cells
    * 17-20) without shipping d3. `coords` is the m18 payload
    * (topic, x, y, proportion); `relevance` the m7 payload
    * (topic, rank, term, relevance). When `components` carries the m22
    * payload (topic, term, logphi, loglift), the page also gets
    * pyLDAvis' signature λ SLIDER: relevance = λ·logφ + (1−λ)·lift is
    * recomputed and re-ranked client-side as the slider moves (vanilla
    * JS over the embedded model-sized table — still zero external
    * assets). Driver-side by design: all inputs are model-sized (k,
    * k×topN, k×candidates rows).
    */
  def saveIntertopicHtml(coords: DataFrame, relevance: DataFrame,
      path: String, title: String,
      components: Option[DataFrame] = None): Unit = {
    val cs = coords.select("topic", "x", "y", "proportion").collect()
      .map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2), r.getDouble(3)))
      .sortBy(_._1)
    val termsByTopic = relevance.select("topic", "rank", "term", "relevance")
      .collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getString(2), r.getDouble(3)))
      .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    val (w, h, pad) = (520.0, 520.0, 70.0)
    val xs = cs.map(_._2); val ys = cs.map(_._3)
    def scale(v: Double, lo: Double, hi: Double, outMax: Double): Double =
      if (hi - lo < 1e-12) outMax / 2
      else pad + (v - lo) / (hi - lo) * (outMax - 2 * pad)
    val maxProp = math.max(cs.map(_._4).max, 1e-12)
    val svg = new StringBuilder
    svg ++= s"""<svg id="map" viewBox="0 0 ${w.toInt} ${h.toInt}" width="${w.toInt}" height="${h.toInt}">"""
    svg ++= s"""<line x1="${(w / 2).toInt}" y1="0" x2="${(w / 2).toInt}" y2="${h.toInt}" stroke="#ddd"/>"""
    svg ++= s"""<line x1="0" y1="${(h / 2).toInt}" x2="${w.toInt}" y2="${(h / 2).toInt}" stroke="#ddd"/>"""
    cs.foreach { case (t, x, y, p) =>
      val cx = scale(x, xs.min, xs.max, w)
      val cy = scale(y, ys.min, ys.max, h)
      val r = 8 + 40 * math.sqrt(p / maxProp) // area ∝ proportion
      svg ++= f"""<circle class="topic" id="c$t" cx="$cx%.1f" cy="$cy%.1f" r="$r%.1f" fill="#4a90d9" fill-opacity="0.45" stroke="#1c5a96" onmouseover="show($t)"/>"""
      svg ++= f"""<text x="$cx%.1f" y="$cy%.1f" text-anchor="middle" dominant-baseline="middle" font-size="12" pointer-events="none">$t</text>"""
    }
    svg ++= "</svg>"
    val panels = new StringBuilder
    cs.foreach { case (t, _, _, p) =>
      val ts = termsByTopic.getOrElse(t, Array.empty)
      val rels = ts.map(_._4)
      val (rLo, rHi) = if (rels.isEmpty) (0.0, 1.0) else (rels.min, rels.max)
      panels ++= s"""<div class="terms" id="p$t" style="display:none"><h2>Topic $t"""
      panels ++= f""" <small>(${100 * p}%.1f%% of tokens)</small></h2>"""
      ts.foreach { case (_, rank, term, rel) =>
        val frac = if (rHi - rLo < 1e-12) 1.0 else 0.15 + 0.85 * (rel - rLo) / (rHi - rLo)
        panels ++= f"""<div class="bar"><span class="lbl">$rank. ${esc(term)}</span>"""
        panels ++= f"""<span class="fill" style="width:${(260 * frac).toInt}px"></span>"""
        panels ++= f"""<span class="val">$rel%.3f</span></div>"""
      }
      panels ++= "</div>"
    }
    val first = cs.headOption.map(_._1).getOrElse(0)
    // embedded slider payload: topic -> [[term, logphi, loglift], ...]
    val compJs = components.map { df =>
      val byTopic = df.select("topic", "term", "logphi", "loglift").collect()
        .map(r => (r.getInt(0), r.getString(1), r.getDouble(2), r.getDouble(3)))
        .groupBy(_._1)
      byTopic.toSeq.sortBy(_._1).map { case (t, rows) =>
        val items = rows.sortBy(_._2).map { case (_, term, lp, ll) =>
          s"""["${jsEsc(term)}",$lp,$ll]"""
        }.mkString(",")
        s""""$t":[$items]"""
      }.mkString("{", ",", "}")
    }
    val sliderMarkup = if (compJs.isDefined)
      """<div class="ctl"><label>&#955; = <span id="lamv">0.60</span></label>
        |<input id="lam" type="range" min="0" max="1" step="0.01" value="0.6"
        |  oninput="setLam(this.value)"/>
        |<small>relevance = &#955;&#183;log &#966; + (1&#8722;&#955;)&#183;log lift</small></div>
        |<div id="dyn"></div>""".stripMargin
    else ""
    val script = compJs match {
      case Some(comp) =>
        s"""var comp=$comp;
           |var lam=0.6, cur=-1;
           |function show(t){cur=t;render();}
           |function setLam(v){lam=parseFloat(v);
           |  document.getElementById('lamv').textContent=lam.toFixed(2);render();}
           |function render(){
           |  if(cur<0)return;
           |  var rows=(comp[cur]||[]).map(function(r){
           |    return [r[0], lam*r[1]+(1-lam)*r[2]];});
           |  rows.sort(function(a,b){return b[1]-a[1]||(a[0]<b[0]?-1:1);});
           |  rows=rows.slice(0,10);
           |  var lo=rows.length?rows[rows.length-1][1]:0, hi=rows.length?rows[0][1]:1;
           |  var h='<h2>Topic '+cur+'</h2>';
           |  for(var i=0;i<rows.length;i++){
           |    var f=(hi-lo<1e-12)?1:0.15+0.85*(rows[i][1]-lo)/(hi-lo);
           |    h+='<div class="bar"><span class="lbl">'+(i+1)+'. '+rows[i][0]
           |      +'</span><span class="fill" style="width:'+Math.round(260*f)
           |      +'px"></span><span class="val">'+rows[i][1].toFixed(3)+'</span></div>';
           |  }
           |  document.getElementById('dyn').innerHTML=h;
           |}
           |show($first);""".stripMargin
      case None =>
        s"""var cur=-1;
           |function show(t){
           |  if(cur>=0){document.getElementById('p'+cur).style.display='none';}
           |  document.getElementById('p'+t).style.display='block';cur=t;
           |}
           |show($first);""".stripMargin
    }
    // with the slider active the dynamic panel replaces the static
    // λ=0.6 panels (which remain the no-components rendering)
    val rightPanel = if (compJs.isDefined) sliderMarkup else panels.toString
    val html = s"""<!DOCTYPE html>
<html><head><meta charset="utf-8"/><title>${esc(title)}</title><style>
body{font-family:sans-serif;display:flex;gap:24px;margin:16px}
h1{font-size:18px} h2{font-size:15px}
.bar{display:flex;align-items:center;gap:6px;margin:2px 0;font-size:13px}
.lbl{width:130px;overflow:hidden;text-overflow:ellipsis;white-space:nowrap}
.fill{display:inline-block;height:12px;background:#4a90d9}
.val{color:#666;font-size:11px}
.ctl{margin-bottom:8px;font-size:13px}
circle.topic:hover{fill-opacity:0.8;cursor:pointer}
</style></head><body>
<div><h1>${esc(title)}</h1>$svg
<p><small>Intertopic distance map: Jensen–Shannon divergence, classical MDS.
Area &#8733; marginal topic proportion. Hover a topic for its relevance terms
(&#955;=0.6).</small></p></div>
<div>$rightPanel</div>
<script>
$script
</script>
</body></html>
"""
    java.nio.file.Files.writeString(java.nio.file.Paths.get(path), html)
  }
}
