package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** O-T12 (POS filter) + O-T15 (POS-aware lemmatization) — the two
  * clean()-chain steps the reference delegates to NLTK
  * (data_preparation.py:52 pos_tag keep-list, :60-80 WordNet lemmatizer
  * with tag-initial → wordnet-POS defaulting to NOUN).
  *
  * Offline build (no NLTK, no model downloads), so both are rule-based
  * JVM re-implementations with DOCUMENTED DIVERGENCE from NLTK's
  * averaged-perceptron tagger / WordNet morphy:
  *  - tagging: closed-class word lists decide function words; suffix
  *    rules decide open-class tags; unknown defaults to NN (same default
  *    NLTK uses for unseen tokens).
  *  - lemmatization: WordNet morphy's detachment rules plus a bundled
  *    irregular-exception table (resources/graft/lemma-exceptions.tsv,
  *    the *.exc shape: "went"→"go", "children"→"child"); the remaining
  *    divergence is morphy's dictionary validation of every detachment,
  *    impossible offline. PosLemmaSpec pins exact in/out pairs.
  *
  * The keep-list matches the reference exactly: NN/NNS/NNP/NNPS, JJ/JJR/
  * JJS, RB/RBR/RBS — nouns, adjectives, adverbs survive; everything
  * else is dropped.
  */
object PosLemma {

  // closed-class (function) words → dropped by the POS filter
  private val determiners = Set("the", "a", "an", "this", "that", "these",
    "those", "each", "every", "either", "neither", "some", "any", "no",
    "all", "both", "half", "such", "what", "which", "whose")
  private val prepositions = Set("of", "in", "to", "for", "with", "on",
    "at", "by", "from", "up", "about", "into", "over", "after", "under",
    "between", "through", "during", "before", "above", "below", "off",
    "out", "around", "near", "since", "until", "upon", "within", "without",
    "toward", "towards", "against", "along", "across", "behind", "beyond",
    "except", "despite", "among", "amid", "via", "per")
  private val conjunctions = Set("and", "or", "but", "nor", "so", "yet",
    "although", "because", "if", "while", "unless", "whereas", "though",
    "whether")
  private val pronouns = Set("i", "you", "he", "she", "it", "we", "they",
    "me", "him", "her", "us", "them", "my", "your", "his", "its", "our",
    "their", "mine", "yours", "hers", "ours", "theirs", "myself",
    "yourself", "himself", "herself", "itself", "ourselves", "themselves",
    "who", "whom", "someone", "anyone", "everyone", "nobody", "something",
    "anything", "everything", "nothing")
  private val auxiliaries = Set("be", "am", "is", "are", "was", "were",
    "been", "being", "have", "has", "had", "having", "do", "does", "did",
    "doing", "will", "would", "shall", "should", "can", "could", "may",
    "might", "must", "ought", "need", "dare")
  private val commonVerbs = Set("say", "says", "said", "get", "gets",
    "got", "make", "makes", "made", "go", "goes", "went", "gone", "know",
    "knows", "knew", "known", "take", "takes", "took", "taken", "see",
    "sees", "saw", "seen", "come", "comes", "came", "think", "thinks",
    "thought", "want", "wants", "wanted", "give", "gives", "gave",
    "given", "use", "uses", "used", "find", "finds", "found", "tell",
    "tells", "told", "become", "becomes", "became", "show", "shows",
    "showed", "shown", "leave", "leaves", "left", "feel", "feels",
    "felt", "put", "puts", "bring", "brings", "brought", "begin",
    "begins", "began", "begun", "keep", "keeps", "kept", "hold", "holds",
    "held", "write", "writes", "wrote", "written", "stand", "stands",
    "stood", "hear", "hears", "heard", "let", "lets", "mean", "means",
    "meant", "set", "sets", "meet", "meets", "met", "run", "runs", "ran",
    "pay", "pays", "paid", "sit", "sits", "sat", "speak", "speaks",
    "spoke", "spoken", "lie", "lies", "lay", "lead", "leads", "led")
  private val adverbsIrregular = Set("very", "too", "quite", "rather",
    "also", "just", "now", "then", "here", "there", "again", "always",
    "never", "often", "soon", "still", "already", "even", "only", "well",
    "almost", "perhaps", "maybe", "together", "instead", "once", "twice",
    "ever", "far", "fast", "hard", "late", "early", "today", "tomorrow",
    "yesterday", "away", "back", "down", "more", "most", "less", "least",
    "much", "enough", "however", "moreover", "therefore", "thus",
    "meanwhile", "nevertheless", "nonetheless", "otherwise", "indeed")

  /** Simplified Penn tag for a (lowercased) token. */
  def posTag(t: String): String = {
    if (t.isEmpty) "NN"
    else if (determiners.contains(t)) "DT"
    else if (prepositions.contains(t)) "IN"
    else if (conjunctions.contains(t)) "CC"
    else if (pronouns.contains(t)) "PRP"
    else if (auxiliaries.contains(t)) "MD"
    else if (commonVerbs.contains(t)) "VB"
    else if (adverbsIrregular.contains(t) || t.endsWith("ly")) "RB"
    else if (t.forall(_.isDigit)) "CD"
    else if (t.endsWith("ing") && t.length > 5) "VBG"
    else if (t.endsWith("ed") && t.length > 4) "VBD"
    else if (t.endsWith("able") || t.endsWith("ible") || t.endsWith("ful") ||
      t.endsWith("ous") || t.endsWith("ive") || t.endsWith("ic") ||
      t.endsWith("al") || t.endsWith("ish")) "JJ"
    else if (t.endsWith("er") && t.length > 4 && !t.endsWith("eer")) "JJR"
    else if (t.endsWith("est") && t.length > 5) "JJS"
    else "NN"
  }

  /** The reference's keep-list (data_preparation.py:52). */
  private val keepTags =
    Set("NN", "NNS", "NNP", "NNPS", "JJ", "JJR", "JJS", "RB", "RBR", "RBS")

  def keep(tag: String): Boolean = keepTags.contains(tag)

  /** Irregular-inflection exception tables (WordNet *.exc shape,
    * hand-authored high-frequency subset bundled as a resource),
    * consulted BEFORE the detachment rules exactly like morphy.
    */
  private lazy val exceptions: Map[Char, Map[String, String]] = {
    val in = getClass.getResourceAsStream("/graft/lemma-exceptions.tsv")
    require(in != null, "lemma-exceptions.tsv missing from classpath")
    val src = scala.io.Source.fromInputStream(in, "UTF-8")
    try src.getLines()
      .filterNot(l => l.startsWith("#") || l.trim.isEmpty)
      .map { l => val f = l.split("\t"); (f(0).head, f(1), f(2)) }
      .toSeq.groupBy(_._1)
      .map { case (pos, rows) =>
        pos -> rows.map(r => r._2 -> r._3).toMap }
    finally src.close()
  }
  private[functions] def nounExc: Map[String, String] = exceptions('n')
  private[functions] def verbExc: Map[String, String] = exceptions('v')
  private[functions] def adjExc: Map[String, String] = exceptions('a')

  /** WordNet-morphy lemmatization: irregular-exception lookup first,
    * then the detachment rules, POS-aware with the reference's
    * tag-initial mapping (J→adj, V→verb, R→adv, default noun —
    * data_preparation.py:65-72). Residual divergence from NLTK: morphy
    * validates every detachment against the WordNet dictionary, which
    * an offline build cannot; the exception table covers the frequent
    * irregulars instead ("went"→"go", "children"→"child").
    */
  def lemmatize(t: String, tag: String): String = {
    def tryRules(word: String, rules: Seq[(String, String)]): String =
      rules.collectFirst {
        case (suf, rep) if word.endsWith(suf) && word.length > suf.length + 1 =>
          word.dropRight(suf.length) + rep
      }.getOrElse(word)
    tag.headOption match {
      case Some('V') =>
        verbExc.getOrElse(t,
          tryRules(t, Seq("ies" -> "y", "es" -> "e", "ed" -> "", "ing" -> "", "s" -> "")))
      case Some('J') | Some('R') =>
        adjExc.getOrElse(t, tryRules(t, Seq("est" -> "", "er" -> "")))
      case _ => // noun default
        nounExc.getOrElse(t, {
          // guards: short nouns and -ss/-us/-is endings are lexical, not
          // plural ("gas", "bus", "glass", "virus", "basis")
          if (t.length <= 3 || t.endsWith("ss") || t.endsWith("us") || t.endsWith("is")) t
          else tryRules(t, Seq("ches" -> "ch", "shes" -> "sh", "ses" -> "s",
            "xes" -> "x", "zes" -> "z", "ves" -> "f", "ies" -> "y",
            "men" -> "man", "s" -> ""))
        })
    }
  }

  /** Full O-T12+O-T15 over a token array: tag, filter to content POS,
    * lemmatize survivors.
    */
  val posFilterLemmatize: Column => Column =
    udf { tokens: Seq[String] =>
      tokens.flatMap { t =>
        val tag = posTag(t)
        if (keep(tag)) Some(lemmatize(t, tag)) else None
      }
    }.apply(_)

  /** DuckDB oracle twin of posFilterLemmatize over a token-list SQL
    * expression — generated from the SAME word sets and rule tables as
    * the UDF, so the two cannot drift. The tagger's check order is
    * preserved exactly (closed classes → adverb → digits → verb
    * suffixes → adjective suffixes → comparative/superlative → noun
    * default); dropped tags (DT/IN/CC/PRP/MD/VB/CD/VBG/VBD) map to NULL
    * and are filtered, kept tags route to the matching detachment rules.
    */
  def oracleSql(toks: String): String = {
    def l(ws: Set[String]) =
      ws.toSeq.sorted.map(w => "'" + w.replace("'", "''") + "'")
        .mkString("[", ", ", "]")
    def m(pairs: Map[String, String]) = {
      def sq(w: String) = "'" + w.replace("'", "''") + "'"
      val es = pairs.toSeq.sorted
      "map(" + es.map(e => sq(e._1)).mkString("[", ", ", "]") +
        ", " + es.map(e => sq(e._2)).mkString("[", ", ", "]") + ")"
    }
    val closed = l(determiners ++ prepositions ++ conjunctions ++
      pronouns ++ auxiliaries ++ commonVerbs)
    val adv = l(adverbsIrregular)
    // irregular exceptions first (same tables the UDF loads), then
    // tryRules for J/R tags: ("est" -> "", "er" -> ""), guard len > suf+1
    val jrLemma =
      s"""coalesce(${m(adjExc)}[t][1],
        |CASE WHEN t LIKE '%est' AND length(t) > 4 THEN left(t, length(t)-3)
        |     WHEN t LIKE '%er' AND length(t) > 3 THEN left(t, length(t)-2)
        |     ELSE t END)""".stripMargin
    // noun rules with the exception table + lexical-ending guards
    val nounLemma =
      s"""coalesce(${m(nounExc)}[t][1],
        |CASE WHEN length(t) <= 3 OR t LIKE '%ss' OR t LIKE '%us' OR t LIKE '%is' THEN t
        |     WHEN t LIKE '%ches' AND length(t) > 5 THEN left(t, length(t)-4) || 'ch'
        |     WHEN t LIKE '%shes' AND length(t) > 5 THEN left(t, length(t)-4) || 'sh'
        |     WHEN t LIKE '%ses' AND length(t) > 4 THEN left(t, length(t)-3) || 's'
        |     WHEN t LIKE '%xes' AND length(t) > 4 THEN left(t, length(t)-3) || 'x'
        |     WHEN t LIKE '%zes' AND length(t) > 4 THEN left(t, length(t)-3) || 'z'
        |     WHEN t LIKE '%ves' AND length(t) > 4 THEN left(t, length(t)-3) || 'f'
        |     WHEN t LIKE '%ies' AND length(t) > 4 THEN left(t, length(t)-3) || 'y'
        |     WHEN t LIKE '%men' AND length(t) > 4 THEN left(t, length(t)-3) || 'man'
        |     WHEN t LIKE '%s' AND length(t) > 2 THEN left(t, length(t)-1)
        |     ELSE t END)""".stripMargin
    s"""list_filter(list_transform($toks, t ->
       |  CASE
       |    WHEN list_contains($closed, t) THEN NULL
       |    WHEN list_contains($adv, t) OR t LIKE '%ly' THEN $jrLemma
       |    WHEN regexp_matches(t, '^[0-9]+$$') THEN NULL
       |    WHEN t LIKE '%ing' AND length(t) > 5 THEN NULL
       |    WHEN t LIKE '%ed' AND length(t) > 4 THEN NULL
       |    WHEN t LIKE '%able' OR t LIKE '%ible' OR t LIKE '%ful' OR t LIKE '%ous'
       |         OR t LIKE '%ive' OR t LIKE '%ic' OR t LIKE '%al' OR t LIKE '%ish'
       |      THEN $jrLemma
       |    WHEN t LIKE '%er' AND length(t) > 4 AND t NOT LIKE '%eer' THEN $jrLemma
       |    WHEN t LIKE '%est' AND length(t) > 5 THEN $jrLemma
       |    ELSE $nounLemma
       |  END), x -> x IS NOT NULL)""".stripMargin
  }
}
