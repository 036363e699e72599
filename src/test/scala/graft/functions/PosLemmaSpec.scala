package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Pinned-pair tests for the rule-based POS tagger + morphy-lite
  * lemmatizer (documented divergence from NLTK: no perceptron, no
  * WordNet exception tables).
  */
class PosLemmaSpec extends AnyFunSuite {
  import PosLemma._

  test("closed-class words are tagged as function words and dropped") {
    Seq("the" -> "DT", "of" -> "IN", "and" -> "CC", "they" -> "PRP",
      "is" -> "MD", "said" -> "VB").foreach { case (w, t) =>
      assert(posTag(w) == t, w)
      assert(!keep(posTag(w)), w)
    }
  }

  test("content words survive the filter") {
    Seq("government" -> "NN", "economic" -> "JJ", "quickly" -> "RB",
      "reports" -> "NN", "beautiful" -> "JJ").foreach { case (w, t) =>
      assert(posTag(w) == t, w)
      assert(keep(posTag(w)), w)
    }
  }

  test("verb-ish suffixes are dropped") {
    assert(posTag("running") == "VBG" && !keep("VBG"))
    assert(posTag("walked") == "VBD" && !keep("VBD"))
    assert(posTag("42") == "CD" && !keep("CD"))
  }

  test("noun lemmatization strips plurals") {
    assert(lemmatize("reports", "NN") == "report")
    assert(lemmatize("countries", "NN") == "country")
    assert(lemmatize("churches", "NN") == "church")
    assert(lemmatize("boxes", "NN") == "box")
    assert(lemmatize("wolves", "NN") == "wolf")
    assert(lemmatize("women", "NN") == "woman")
    assert(lemmatize("news", "NN") == "new") // known divergence from WordNet
  }

  test("verb lemmatization strips inflection") {
    assert(lemmatize("studies", "VB") == "study")
    assert(lemmatize("talking", "VBG") == "talk")
    assert(lemmatize("played", "VBD") == "play")
  }

  test("adjective/adverb lemmatization strips comparatives") {
    assert(lemmatize("faster", "JJR") == "fast")
    assert(lemmatize("strongest", "JJS") == "strong")
  }

  test("short words are not over-stripped") {
    assert(lemmatize("gas", "NN") == "gas")
    assert(lemmatize("bus", "NN") == "bus")
    assert(lemmatize("is", "VB") == "is")
  }

  test("full pipeline on a pinned sentence") {
    val spark = graft.TestSpark.spark
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val out = Seq("The governments quickly announced new economic policies")
      .toDF("text")
      .select(PosLemma.posFilterLemmatize(
        TextFunctions.contentTokens(
          TextFunctions.tokenize(TextFunctions.cleanChain(col("text"))))))
      .as[Seq[String]].collect().head
    // "the" (stop), "announced" (VBD) dropped; plurals lemmatized
    assert(out == Seq("government", "quickly", "new", "economic", "policy"))
  }
}
