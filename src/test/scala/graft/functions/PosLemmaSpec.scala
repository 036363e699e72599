package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Pinned-pair tests for the rule-based POS tagger + morphy-lite
  * lemmatizer (documented divergence from NLTK: no perceptron; the
  * bundled exception table covers frequent irregulars, not the full
  * WordNet dictionary validation).
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
  }

  test("irregular exceptions resolve before detachment rules") {
    // nouns
    assert(lemmatize("children", "NN") == "child")
    assert(lemmatize("feet", "NNS") == "foot")
    assert(lemmatize("mice", "NN") == "mouse")
    assert(lemmatize("people", "NN") == "person")
    assert(lemmatize("crises", "NN") == "crisis")
    assert(lemmatize("criteria", "NN") == "criterion")
    assert(lemmatize("wives", "NN") == "wife") // ves→f rule would give "wif"
    assert(lemmatize("news", "NN") == "news")  // fixed: was "new" pre-table
    assert(lemmatize("series", "NN") == "series")
    assert(lemmatize("politics", "NN") == "politics")
    // verbs
    assert(lemmatize("went", "VBD") == "go")
    assert(lemmatize("was", "VBD") == "be")
    assert(lemmatize("taken", "VBN") == "take")
    assert(lemmatize("wrote", "VBD") == "write")
    assert(lemmatize("caught", "VBD") == "catch")
    // adjectives / adverbs
    assert(lemmatize("better", "JJR") == "good")
    assert(lemmatize("worst", "JJS") == "bad")
    assert(lemmatize("further", "RBR") == "far")
    assert(lemmatize("least", "JJS") == "little")
  }

  test("widened exception table covers the long tail") {
    // long-tail irregulars (the round-4 gap: 362 entries vs WordNet's exc
    // breadth); each family below is pinned by one representative
    assert(lemmatize("oxen", "NNS") == "ox")
    assert(lemmatize("lain", "VBN") == "lie")
    assert(lemmatize("worse", "JJR") == "bad")
    assert(lemmatize("potatoes", "NNS") == "potato")   // -oes trap: -s rule gave "potatoe"
    assert(lemmatize("spectra", "NNS") == "spectrum")  // Latin plural
    assert(lemmatize("synopses", "NNS") == "synopsis") // Greek plural
    assert(lemmatize("headquarters", "NN") == "headquarters") // invariant
    assert(lemmatize("carried", "VBD") == "carry")     // -ied: ed-rule gave "carri"
    assert(lemmatize("hoped", "VBD") == "hope")        // silent-e: ed-rule gave "hop"
    assert(lemmatize("planned", "VBD") == "plan")      // doubling: gave "plann"
    assert(lemmatize("withdrew", "VBD") == "withdraw")
    assert(lemmatize("happier", "JJR") == "happy")     // -ier: er-rule gave "happi"
    assert(lemmatize("biggest", "JJS") == "big")       // doubling comparative
    // identity entries: the suffix tagger routes -er/-est nouns through
    // the comparative rules; morphy's dictionary check would keep them
    // whole, and so must we
    assert(lemmatize("teacher", "JJR") == "teacher")   // was "teach"
    assert(lemmatize("mother", "JJR") == "mother")     // was "moth"
    assert(lemmatize("forest", "JJS") == "forest")     // was "for"
  }

  test("round-6 widening: -ate/-ize e-restoration, -s traps, -ics fields") {
    // silent-e restoration across the -ate/-ize/-ise regulars (the
    // dominant verb.exc family by volume; ed-rule alone gave "activat")
    assert(lemmatize("activated", "VBD") == "activate")
    assert(lemmatize("organizing", "VBG") == "organize")
    assert(lemmatize("recognised", "VBD") == "recognise")
    assert(lemmatize("supervising", "VBG") == "supervise")
    assert(lemmatize("collided", "VBD") == "collide")
    // round-6 doubling and -y verbs
    assert(lemmatize("acquitted", "VBD") == "acquit")
    assert(lemmatize("complied", "VBD") == "comply")
    assert(lemmatize("quantifies", "VBZ") == "quantify")
    // singular -s traps the bare detachment would mangle
    assert(lemmatize("news", "NN") == "news")          // was "new"
    assert(lemmatize("chaos", "NN") == "chaos")        // was "chao"
    assert(lemmatize("lens", "NN") == "lens")          // was "len"
    assert(lemmatize("riches", "NNS") == "riches")     // ches-rule gave "rich"
    assert(lemmatize("rabies", "NN") == "rabies")      // ies-rule gave "raby"
    // fields of study stay plural (dictionary lemmas)
    assert(lemmatize("statistics", "NN") == "statistics")
    assert(lemmatize("forensics", "NN") == "forensics")
    // classical additions
    assert(lemmatize("corpora", "NNS") == "corpus")
    assert(lemmatize("feet", "NNS") == "foot")
    // round-6 identity -er nouns and -y comparatives
    assert(lemmatize("photographer", "JJR") == "photographer")
    assert(lemmatize("stakeholder", "JJR") == "stakeholder")
    assert(lemmatize("murkier", "JJR") == "murky")
    assert(lemmatize("spookiest", "JJS") == "spooky")
  }

  test("round-6b widening: probe-driven identity, agents, -ses nouns") {
    // probe-driven identity entries: words the JJR/JJS/RB detachments
    // demonstrably mangled ("other"->"oth", "never"->"nev") before the
    // round-6b table
    assert(lemmatize("other", "JJR") == "other")
    assert(lemmatize("never", "RB") == "never")
    assert(lemmatize("however", "RB") == "however")
    assert(lemmatize("together", "RB") == "together")
    assert(lemmatize("clever", "JJR") == "clever")
    assert(lemmatize("digest", "JJS") == "digest")
    assert(lemmatize("invest", "JJS") == "invest")
    assert(lemmatize("priest", "JJS") == "priest")
    // agent nominalizations survive the comparative stripper
    assert(lemmatize("attacker", "JJR") == "attacker")
    assert(lemmatize("translator", "NN") == "translator")
    assert(lemmatize("reviewer", "JJR") == "reviewer")
    assert(lemmatize("interviewer", "JJR") == "interviewer")
    // -ses noun traps: the bare ses->s rule gave "hous"
    assert(lemmatize("houses", "NNS") == "house")
    assert(lemmatize("promises", "NNS") == "promise")
    assert(lemmatize("licenses", "NNS") == "license")
    assert(lemmatize("responses", "NNS") == "response")
    // round-6b classical plurals
    assert(lemmatize("data", "NNS") == "datum")
    assert(lemmatize("media", "NNS") == "medium")
    assert(lemmatize("corpora", "NNS") == "corpus")
    assert(lemmatize("sarcophagi", "NNS") == "sarcophagus")
    // silent-e / -y verb widening
    assert(lemmatize("seized", "VBD") == "seize")
    assert(lemmatize("plunging", "VBG") == "plunge")
    assert(lemmatize("queried", "VBD") == "query")
  }

  test("round-7 widening: golden-corpus probe families") {
    // silent-e gerunds ("living" -> "liv" before the round-7 table)
    assert(lemmatize("living", "VBG") == "live")
    assert(lemmatize("driving", "VBG") == "drive")
    assert(lemmatize("leaving", "VBG") == "leave")
    assert(lemmatize("starving", "VBG") == "starve")
    // participial adjectives the VBD route mangled
    assert(lemmatize("bereaved", "VBD") == "bereave")
    assert(lemmatize("unsolved", "VBD") == "unsolved")
    // -er/-est nouns and UK proper nouns off the comparative route
    assert(lemmatize("manchester", "JJR") == "manchester") // was "manchest"
    assert(lemmatize("newspaper", "JJR") == "newspaper")   // was "newspap"
    assert(lemmatize("inquest", "JJS") == "inquest")       // was "inqu"
    assert(lemmatize("tower", "JJR") == "tower")
    assert(lemmatize("forever", "JJR") == "forever")
    // silent-e adjective comparatives
    assert(lemmatize("largest", "JJS") == "large")         // was "larg"
    assert(lemmatize("closer", "JJR") == "close")          // was "clos"
    assert(lemmatize("safest", "JJS") == "safe")
    // invariant / proper-noun -s forms off the plural route
    assert(lemmatize("wales", "NN") == "wales")            // was "wale"
    assert(lemmatize("thames", "NN") == "thames")          // was "thame"
    assert(lemmatize("olympics", "NN") == "olympics")
    assert(lemmatize("commons", "NN") == "commons")
    // "whether" joined the closed conjunction class (dropped, like NLTK)
    assert(posTag("whether") == "CC" && !keep("CC"))
    // deliberate original mappings still win over identity widening
    assert(lemmatize("upper", "JJR") == "up")
    assert(lemmatize("latter", "JJR") == "late")
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
    assert(lemmatize("is", "VB") == "be") // irregular table: was "is" pre-table
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
