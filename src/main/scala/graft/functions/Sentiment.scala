package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** O-M7/O-M8: polarity + subjectivity scoring, re-implementing the
  * observable semantics of the reference's per-row sentiment UDF
  * (notebooks/sentiment_analysis.ipynb cell 7 / lines 262-263, which
  * calls TextBlob's pattern-based analyzer):
  *
  *  - a lexicon maps words to (polarity ∈ [-1,1], subjectivity ∈ [0,1],
  *    intensity); the document score is the MEAN over matched words,
  *    (0.0, 0.0) when nothing matches — exactly TextBlob's averaging.
  *  - an intensity-carrying modifier ("very", "extremely", …) directly
  *    before a lexicon word scales that word's polarity and subjectivity
  *    by its intensity (clamped to the valid range).
  *  - a negator within the two tokens before a lexicon word multiplies
  *    its polarity by -0.5 (TextBlob's negation dampening); subjectivity
  *    is unaffected by negation.
  *
  * The lexicon itself is hand-authored (resources/graft/
  * sentiment-lexicon.tsv) — the reference's lexicon is a third-party
  * artifact we re-create in shape, not in bytes, so absolute scores
  * diverge from TextBlob's while the algebra (averaging, negation,
  * intensification, bounds) matches. SentimentSpec pins exact pairs.
  *
  * Scale: a deterministic scalar Scala UDF — breaks whole-stage codegen
  * at the one projection it appears in but stays pipelined (no shuffle,
  * no state); the lexicon is a JVM-static map loaded once per executor.
  */
object Sentiment {

  final case class Entry(polarity: Double, subjectivity: Double, intensity: Double)

  /** Loaded once per JVM from the bundled resource. */
  lazy val lexicon: Map[String, Entry] = {
    val in = getClass.getResourceAsStream("/graft/sentiment-lexicon.tsv")
    require(in != null, "sentiment-lexicon.tsv missing from classpath")
    val src = scala.io.Source.fromInputStream(in, "UTF-8")
    try src.getLines()
      .filterNot(l => l.startsWith("#") || l.trim.isEmpty)
      .map { l =>
        val f = l.split("\t")
        f(0) -> Entry(f(1).toDouble, f(2).toDouble, f(3).toDouble)
      }.toMap
    finally src.close()
  }

  val negators: Set[String] = Set("not", "never", "no", "nothing", "neither", "nor", "cannot")

  private def isNegator(tok: String): Boolean =
    negators.contains(tok) || tok.endsWith("n't")

  /** Tokenize keeping intra-word apostrophes (so "isn't" survives). */
  private def toks(text: String): Array[String] =
    text.toLowerCase.split("[^a-z0-9']+").filter(_.nonEmpty)

  private def clamp(v: Double, lo: Double, hi: Double): Double =
    math.max(lo, math.min(hi, v))

  /** Core scorer — also called directly by tests. */
  def score(text: String): (Double, Double) = {
    if (text == null) return (0.0, 0.0)
    val ts = toks(text)
    var sumP = 0.0; var sumS = 0.0; var n = 0
    var i = 0
    while (i < ts.length) {
      lexicon.get(ts(i)) match {
        // a modifier acting on the next lexicon word is consumed into
        // that word's assessment (pattern semantics), not scored itself
        case Some(e) if e.intensity != 1.0 && i + 1 < ts.length &&
            lexicon.contains(ts(i + 1)) => ()
        case Some(e) =>
          var p = e.polarity
          var s = e.subjectivity
          // intensifier directly before (itself a lexicon word with
          // intensity != 1): scale this word
          if (i > 0) lexicon.get(ts(i - 1)).foreach { prev =>
            if (prev.intensity != 1.0) {
              p = clamp(p * prev.intensity, -1.0, 1.0)
              s = clamp(s * prev.intensity, 0.0, 1.0)
            }
          }
          // negation within the two preceding tokens: dampen + flip
          val negated = (i > 0 && isNegator(ts(i - 1))) ||
            (i > 1 && isNegator(ts(i - 2)))
          if (negated) p = p * -0.5
          sumP += p; sumS += s; n += 1
        case None => ()
      }
      i += 1
    }
    if (n == 0) (0.0, 0.0) else (sumP / n, sumS / n)
  }

  /** struct(polarity, subjectivity) column. */
  val sentimentUdf: Column => Column = {
    val f = udf { text: String =>
      val (p, s) = score(text)
      (p, s)
    }
    c => f(c).cast("struct<polarity:double,subjectivity:double>")
  }
}
