package graft.functions

import org.apache.spark.sql.{Column, GraftNative}
import org.apache.spark.sql.functions._

/** Text-cleaning column functions reproducing the reference's `clean()`
  * chain (data_preparation.py:28-56) with Spark built-ins only, so the
  * whole pipeline stays inside whole-stage codegen — no UDF, no Python,
  * no per-row interpretation. Each step cites the reference line it
  * mirrors; order is semantic and must not be re-sequenced.
  *
  * All functions are pure Column→Column combinators: they compose into a
  * single generated function per stage at any scale.
  */
object TextFunctions {

  /** NLTK english stop-word list (the reference loads it via
    * nltk.corpus.stopwords, data_preparation.py:45) plus the reference's
    * custom additions ['from','re','also'] (data_preparation.py:46-48).
    * Shipped inline so output is reproducible offline.
    */
  val stopWords: Seq[String] = Seq(
    "i", "me", "my", "myself", "we", "our", "ours", "ourselves",
    "you", "you're", "you've", "you'll", "you'd", "your", "yours",
    "yourself", "yourselves", "he", "him", "his", "himself", "she",
    "she's", "her", "hers", "herself", "it", "it's", "its", "itself",
    "they", "them", "their", "theirs", "themselves", "what", "which",
    "who", "whom", "this", "that", "that'll", "these", "those", "am",
    "is", "are", "was", "were", "be", "been", "being", "have", "has",
    "had", "having", "do", "does", "did", "doing", "a", "an", "the",
    "and", "but", "if", "or", "because", "as", "until", "while", "of",
    "at", "by", "for", "with", "about", "against", "between", "into",
    "through", "during", "before", "after", "above", "below", "to",
    "from", "up", "down", "in", "out", "on", "off", "over", "under",
    "again", "further", "then", "once", "here", "there", "when",
    "where", "why", "how", "all", "any", "both", "each", "few", "more",
    "most", "other", "some", "such", "no", "nor", "not", "only", "own",
    "same", "so", "than", "too", "very", "s", "t", "can", "will",
    "just", "don", "don't", "should", "should've", "now", "d", "ll",
    "m", "o", "re", "ve", "y", "ain", "aren", "aren't", "couldn",
    "couldn't", "didn", "didn't", "doesn", "doesn't", "hadn", "hadn't",
    "hasn", "hasn't", "haven", "haven't", "isn", "isn't", "ma",
    "mightn", "mightn't", "mustn", "mustn't", "needn", "needn't",
    "shan", "shan't", "shouldn", "shouldn't", "wasn", "wasn't",
    "weren", "weren't", "won", "won't", "wouldn", "wouldn't",
    // reference additions, data_preparation.py:46-48
    "from", "re", "also")

  /** O-T2..T10: the regex normalization chain, exactly in reference order
    * (data_preparation.py:34-42). Steps:
    * lower+trim → strip URLs → strip tags → non-alnum→space → drop
    * multi-digit tokens → drop literal http/https/www → drop single
    * letters → collapse spaces. The final punctuation translate
    * (reference :42) is a no-op after the non-alnum pass and is elided.
    */
  def cleanChain(c: Column): Column = {
    // Python str.strip() removes ALL whitespace (\n, \t, …); Spark's trim()
    // removes only ' ' — regexp keeps reference fidelity on newline-edged text
    val lowered = lower(regexp_replace(c, "^\\s+|\\s+$", ""))       // :34
    val noUrl   = regexp_replace(lowered, "http\\S+", "")           // :35
    val noTag   = regexp_replace(noUrl, "<.*?>", "")                // :36
    val alnum   = regexp_replace(noTag, "[^ 0-9a-z]", " ")          // :37
    val noNum   = regexp_replace(alnum, "\\b(\\d+\\d)\\b", "")      // :38
    val noProto = regexp_replace(noNum, "http|https|www", "")       // :39
    val noChar  = regexp_replace(noProto, "\\b[a-z]\\b", "")        // :40
    regexp_replace(noChar, " +", " ")                               // :41
  }

  /** O-T14: whitespace tokenization (data_preparation.py:56). Python
    * str.split() discards leading/trailing whitespace of ANY kind, so the
    * edge-strip must be regexp-based (Spark trim() is space-only).
    */
  def tokenize(c: Column): Column =
    split(regexp_replace(c, "^\\s+|\\s+$", ""), "\\s+")

  /** O-T11 + O-T13: stop-word removal and min-token-length>2 filter
    * (data_preparation.py:54-56), as a higher-order array filter —
    * codegen-friendly, no UDF.
    */
  def contentTokens(tokens: Column): Column = {
    // typedlit → ONE foldable array Literal; array(lit*) would inline 182
    // CreateArray children into the lambda body and blow up codegen size
    val sw = typedLit(stopWords)
    filter(tokens, t => length(t) > 2 && !array_contains(sw, t))
  }

  /** Full clean pipeline: chain → tokenize → stop/length filter → re-join
    * (O-T16). Mirrors clean()'s observable output minus the POS filter
    * (O-T12, see PosFilter) which needs a tagger.
    */
  def cleanText(c: Column): Column =
    array_join(contentTokens(tokenize(cleanChain(c))), " ")

  /** O-P6: word count by single-space split (data_preparation.py:89). */
  def wordCount(c: Column): Column = size(split(c, " "))

  /** Token count via a BPE-ish word regex — counts alphanumeric runs the
    * way subword tokenizers pre-segment (training-data pipeline op).
    */
  def tokenCount(c: Column): Column =
    size(regexp_extract_all(c, lit("[A-Za-z0-9]+"), lit(0)))

  /** Quality score for training-data filtering: mean of four bounded
    * signals — length band, alpha ratio, stop-word ratio band, mean
    * token length band. All built-ins; stays in codegen.
    */
  /** Document quality heuristic, backed by the native quality_raw
    * expression (one token pass inside codegen). The declarative tree
    * it replaced (kept below as qualityScoreDeclarative, spec-pinned
    * equal) multi-referenced tokenize, so Catalyst re-inlined the regex
    * split 3× per row and scanned the 179-word stop list per token
    * interpreted — 5.8 s → sub-second for t20 at sf0.1.
    */
  def qualityScore(c: Column): Column =
    round(GraftNative.column(
      graft.expressions.QualityScore(GraftNative.expression(c))), 6)

  /** The original combinator formulation — the executable SPEC of
    * quality_raw's value contract (TextFunctionsSpec asserts equality
    * on the fixture corpus plus adversarial edges). Not referenced by
    * any query path.
    */
  def qualityScoreDeclarative(c: Column): Column = {
    val toks = tokenize(c)
    val nTok = size(toks)
    val nChars = length(c)
    val alphaChars = length(regexp_replace(c, "[^A-Za-z]", ""))
    val sw = typedLit(stopWords)
    val nStop = size(filter(toks, t => array_contains(sw, lower(t))))
    // partial credit only NEAR the band — an unbounded fallback would
    // hand 0.5 to arbitrarily long junk documents
    val lengthOk = when(nTok >= 50 && nTok <= 10000, 1.0)
      .when((nTok >= 10 && nTok < 50) || (nTok > 10000 && nTok <= 20000), 0.5)
      .otherwise(0.0)
    val alphaRatio = when(nChars > 0, alphaChars.cast("double") / nChars).otherwise(0.0)
    val stopRatio = when(nTok > 0, nStop.cast("double") / nTok).otherwise(0.0)
    val stopOk = when(stopRatio >= 0.05 && stopRatio <= 0.6, 1.0).otherwise(0.0)
    val meanTokLen = when(nTok > 0,
      aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast("double") / nTok)
      .otherwise(0.0)
    val tokLenOk = when(meanTokLen >= 3 && meanTokLen <= 10, 1.0).otherwise(0.0)
    round((lengthOk + alphaRatio + stopOk + tokLenOk) / 4.0, 6)
  }

  /** Stop-word hit ratio per language profile — the language-ID heuristic.
    * English profile = NLTK list; the other profiles are small
    * high-frequency function-word sets. Deterministic argmax, returns
    * "und" when nothing matches (training-data pipeline op).
    */
  val langProfiles: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "a", "in", "is", "it", "that",
      "for", "on", "with", "as", "was", "at", "by", "an", "be", "this",
      "which", "or", "from", "but", "not", "are", "have", "has"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "una", "los",
      "las", "por", "con", "para", "es", "al", "del", "se", "su", "como"),
    "fr" -> Seq("le", "la", "les", "de", "des", "et", "en", "un", "une",
      "du", "que", "qui", "dans", "pour", "est", "pas", "sur", "avec"),
    "de" -> Seq("der", "die", "das", "und", "in", "den", "von", "zu",
      "mit", "sich", "des", "auf", "ist", "im", "dem", "nicht", "ein"))

  def langId(c: Column): Column = langIdFromTokens(tokenize(lower(c)))

  /** langId over pre-computed tokens. Callers that can should tokenize in
    * a separate projection ONCE — this expression references the token
    * array ~8 times (4 profiles × hits + size), and inlining the tokenize
    * subtree at each reference makes the generated code explode.
    */
  def langIdFromTokens(toks: Column): Column = {
    val nTok = size(toks)
    // score per language = fraction of tokens that are profile hits
    val scored = langProfiles.toSeq.sortBy(_._1).map { case (lang, words) =>
      val prof = typedLit(words)
      val hits = size(filter(toks, t => array_contains(prof, t)))
      struct((hits.cast("double") / greatest(nTok, lit(1))).as("score"),
             lit(lang).as("lang"))
    }
    val best = sort_array(array(scored: _*), asc = false).getItem(0)
    when(best.getField("score") >= 0.05, best.getField("lang")).otherwise(lit("und"))
  }

  /** Exact-content fingerprint: md5 of the normalized text — the
    * document-identity key for exact dedup across a 100 TB corpus
    * (hash the normalized form, group on the digest).
    */
  def fingerprint(c: Column): Column = md5(c.cast("binary"))

  /** Word-level n-gram shingles (default n=3) for MinHash/Jaccard dedup.
    * Backed by the native word_ngrams expression (constructed directly,
    * no session registration needed): the
    * transform(sequence)/slice/array_join formulation evaluated
    * interpreted and was the hottest expression in the dedup suite
    * (~10 s at sf0.1); the native form builds each n-gram in one codegen
    * call per row. Empty-safe (short docs → empty array).
    */
  def shingles(tokens: Column, n: Int = 3): Column =
    GraftNative.column(graft.expressions.WordNgrams(
      GraftNative.expression(tokens), GraftNative.expression(lit(n))))

  /** Crawl-frontier URL canonicalization — the normalization a 100 TB
    * crawl dedups its frontier and its fetched pages by (the CommonCrawl/
    * Scrapy `w3lib.url.canonicalize_url` family, RFC 3986 §6 syntax-based
    * normalization plus the usual curation extras):
    *
    *   1. fragment dropped (`#…` never reaches the server),
    *   2. scheme + authority lowercased (RFC 3986 §6.2.2.1; path/query
    *      case is significant and preserved),
    *   3. leading `www.` stripped,
    *   4. default ports stripped (`:443` for https, `:80` for http),
    *   5. trailing path slashes stripped,
    *   6. tracking parameters removed (`utm_*`, `fbclid`, `gclid`,
    *      `ref`) and the surviving query pairs sorted bytewise, so
    *      param order never splits a URL into two frontier entries.
    *
    * Pure built-in Column combinator (regex + split/filter/array_sort) —
    * stays inside whole-stage codegen, map-only at any scale. Each
    * intermediate is referenced at most twice, so alias re-inlining (the
    * PERF-TRAP class) is bounded at a small constant of regex passes per
    * row — the same cost class as [[cleanText]]'s 9-regex chain.
    */
  def canonicalUrl(u: Column): Column = {
    val noFrag = regexp_replace(u, "#.*$", "")
    val auth = regexp_extract(noFrag, "^[A-Za-z][A-Za-z0-9+.\\-]*://[^/?#]*", 0)
    val authCanon = regexp_replace(
      regexp_replace(
        regexp_replace(lower(auth), "^(https?://)www\\.", "$1"),
        "^(https://[^/:]+):443$", "$1"),
      "^(http://[^/:]+):80$", "$1")
    val rest = noFrag.substr(length(auth) + lit(1), lit(1 << 20))
    val path = substring_index(rest, "?", 1)
    val pathCanon = regexp_replace(path, "/+$", "")
    val query = when(length(rest) > length(path),
      rest.substr(length(path) + lit(2), lit(1 << 20))).otherwise(lit(""))
    val kept = filter(split(query, "&"), x =>
      (length(x) > 0) && !x.rlike("^(utm_[A-Za-z0-9_]*|fbclid|gclid|ref)="))
    val qCanon = array_join(array_sort(kept), "&")
    concat(authCanon, pathCanon,
      when(length(qCanon) > 0, concat(lit("?"), qCanon)).otherwise(lit("")))
  }
}
