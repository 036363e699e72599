package graft.functions

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** TextFunctions correctness vs independent in-JVM reference
  * implementations (java.util.regex / plain Scala), mirroring the
  * reference semantics at data_preparation.py:28-56,89.
  */
class TextFunctionsSpec extends AnyFunSuite {
  import TextFunctions._

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Independent re-statement of the clean() chain with plain Java regex —
    * the same spec as cleanChain but a different engine, so a Spark-API
    * misuse (wrong arg order, wrong escaping) cannot pass both.
    */
  private def refClean(s: String): String =
    s.trim.toLowerCase
      .replaceAll("http\\S+", "")
      .replaceAll("<.*?>", "")
      .replaceAll("[^ 0-9a-z]", " ")
      .replaceAll("\\b(\\d+\\d)\\b", "")
      .replaceAll("http|https|www", "")
      .replaceAll("\\b[a-z]\\b", "")
      .replaceAll(" +", " ")

  private def runClean(inputs: Seq[String]): Seq[String] =
    inputs.toDF("text").select(cleanChain($"text")).as[String].collect().toSeq

  private val pinned = Seq(
    "Hello, World! Visit http://example.com/x now",
    "<p>Tagged <b>bold</b> text</p>",
    "numbers 42 7 1999 stay-or-go",
    "  MIXED Case   with    spaces  ",
    "http https www leftovers",
    "a b c single letters go",
    "",
    "   ",
    "already clean lowercase words",
  )

  test("native quality_raw equals the declarative quality formula bit-for-bit") {
    // the declarative tree IS the value contract; run both over the
    // fixture corpus plus adversarial edges (empty, whitespace-only,
    // null, unicode, stopword-only, one-char tokens, huge token)
    val edges = Seq(null, "", "   ", "\t\n ", "the and of to a in is it",
      "naïve café über — ïüé", "a b c d e f g h i j",
      "x" * 500, ("word " * 60).trim,
      "The quick brown fox jumps over the lazy dog and runs far away today")
      .toDF("text")
    val fixture = graft.Tables.documents(spark, graft.TestSpark.sfDir)
      .select(col("text"))
    for (df <- Seq(edges, fixture)) {
      val rows = df.select(
        TextFunctions.qualityScore(col("text")).as("native"),
        round(TextFunctions.qualityScoreDeclarative(col("text")), 6)
          .as("decl")).collect()
      rows.foreach { r =>
        val n = r.getDouble(0)
        val d = if (r.isNullAt(1)) 0.0 else r.getDouble(1)
        assert(n == d, s"native=$n declarative=$d")
      }
    }
  }

  test("gopher_flags: each rule bit falls exactly when its rule is violated") {
    import graft.expressions.GopherFlags
    import org.apache.spark.unsafe.types.UTF8String
    def mask(s: String): Int = GopherFlags.compute(UTF8String.fromString(s))
    val good = ("the data and the model that we have built with care here " +
      "now form a corpus of fifty plus words " + ("plain word " * 20)).trim
    assert(mask(good) == 127, s"good doc mask=${mask(good)}")
    // bit 0: too short
    assert((mask("the cat and the hat have fun with it") & 1) == 0)
    // bit 1: mean word length out of band (all 1-char words)
    assert((mask(("a " * 60).trim) & 2) == 0)
    // bit 2: symbol-heavy (# per word > 0.1)
    assert((mask(good + " " + ("#tag " * 30).trim) & 4) == 0)
    // bit 3: >90% bullet lines
    val bullety = (1 to 20).map(i => s"• item $i").mkString("\n")
    assert((mask(bullety) & 8) == 0)
    // bit 4: >30% ellipsis line endings
    val elly = (1 to 10).map(i => s"line number $i trails off...").mkString("\n")
    assert((mask(elly) & 16) == 0)
    // bit 5: <80% alphabetic words
    assert((mask(("123 456 " * 30).trim) & 32) == 0)
    // bit 6: fewer than 2 distinct stop words
    assert((mask(("word " * 60).trim) & 64) == 0)
    // expression registration + the NULL contract: a null document
    // passes no rules (mask 0, keep false) — matching the DuckDB twin,
    // whose CASE WHENs evaluate null→false and fall to 0
    val viaSql = Seq(good).toDF("text")
      .selectExpr("gopher_flags(text)").collect().head.getInt(0)
    assert(viaSql == 127)
    assert(spark.sql("SELECT gopher_flags(CAST(NULL AS STRING))")
      .collect().head.getInt(0) == 0)
  }

  test("c4_lines: each C4 line rule admits and rejects exactly its cases") {
    import graft.expressions.C4Lines
    import org.apache.spark.unsafe.types.UTF8String
    def kept(s: String): String = C4Lines.compute(UTF8String.fromString(s)).toString
    // rule 1: terminal punctuation — all four C4 marks admit, others drop
    assert(kept("He said it was done.") == "He said it was done.")
    assert(kept("Was it really true?") == "Was it really true?")
    assert(kept("What a surprise indeed!") == "What a surprise indeed!")
    assert(kept("He called it \"a fine day\"") == "He called it \"a fine day\"")
    assert(kept("a header with no punctuation") == "")
    assert(kept("trailing comma is not terminal,") == "")
    // trailing whitespace is trimmed before the terminal check, but the
    // SURVIVING line is the original untrimmed one (list_filter keeps
    // elements verbatim)
    assert(kept("Hello there world.   ") == "Hello there world.   ")
    // rule 2: fewer than 3 words drops even with terminal punctuation
    assert(kept("Too short.") == "")
    assert(kept("Exactly three words.") == "Exactly three words.")
    // rule 3: any javascript mention drops the line, case-insensitive
    assert(kept("Please enable JavaScript to continue reading.") == "")
    assert(kept("this javascript warning ends here.") == "")
    // multi-line page: survivors re-join in order with \n
    val page = "A first good sentence here.\nmenu\nAnd a second good one!\n" +
      "Enable javascript now please.\nLast full line stands tall."
    assert(kept(page) ==
      "A first good sentence here.\nAnd a second good one!\nLast full line stands tall.")
    // empty / blank lines never survive
    assert(kept("") == "")
    assert(kept("\n\n") == "")
    // registration + NULL contract: NULL text → empty string, not NULL
    val viaSql = spark.sql("SELECT c4_lines(CAST(NULL AS STRING))").collect().head
    assert(!viaSql.isNullAt(0) && viaSql.getString(0) == "")
  }

  test("t25 planted pages: page-level C4 rules judge the line-cleaned page") {
    import graft.queries.Text
    val five = (1 to 5).map(i => s"Good full sentence number $i.").mkString("\n")
    val docs = Seq(
      // 0: five surviving sentences, clean page → keep
      (0L, five),
      // 1: five sentences but a lorem-ipsum mention anywhere → drop
      (1L, five + "\nfiller Lorem Ipsum dolor"),
      // 2: five sentences but a curly brace (template/code page) → drop
      (2L, five + "\nif (x) { return; }"),
      // 3: five sentences but a bad word (word-boundary match) → drop
      (3L, five + "\nbest casino bonus here"),
      // 4: word-boundary defense — "cassino" must NOT match the
      //    badword "casino" mid-word, so the page keeps
      (4L, five + "\nthe cassino battle memorial"),
      // 5: only four sentences survive the line filter → drop
      (5L, (1 to 4).map(i => s"Good full sentence number $i.").mkString("\n")),
      // 6: NULL text → empty page, 0 lines, drop (both engines agree)
      (6L, null.asInstanceOf[String]),
    ).toDF("doc_id", "text")
    val got = Text.t25C4Frame(docs).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(got(0L) == ((5, 5L, true)), got(0L).toString)
    assert(got(1L)._3 == false)
    assert(got(2L)._3 == false)
    assert(got(3L)._3 == false)
    assert(got(4L) == ((5, 5L, true)), got(4L).toString)
    assert(got(5L) == ((4, 4L, false)), got(5L).toString)
    assert(got(6L) == ((0, 0L, false)), got(6L).toString)
  }

  test("cleanChain matches the reference regex chain on pinned inputs") {
    assert(runClean(pinned) == pinned.map(refClean))
  }

  test("cleanChain matches the reference regex chain on random inputs") {
    val rng = new scala.util.Random(42)
    val alphabet =
      "abc XYZ 019 .,!<>/:h tp\n\té中" // latin, digits, punct, tags, unicode
    val inputs = Seq.fill(200)(
      (0 until rng.nextInt(80)).map(_ => alphabet(rng.nextInt(alphabet.length))).mkString)
    assert(runClean(inputs) == inputs.map(refClean))
  }

  test("cleanChain is idempotent modulo edge-trim") {
    val once = runClean(pinned)
    val twice = runClean(once)
    assert(twice == once.map(refClean)) // second pass == reference on first pass
  }

  test("cleanText drops stop words and short tokens, joins with spaces") {
    val out = Seq("The quick brown fox is on the hill with it")
      .toDF("text").select(cleanText($"text")).as[String].collect()
    assert(out.head == "quick brown fox hill")
  }

  test("contentTokens removes the reference's custom stop words too") {
    // 'from', 're', 'also' are the reference additions (data_preparation.py:46-48)
    val out = Seq(Seq("from", "also", "keep", "re", "words"))
      .toDF("toks").select(contentTokens($"toks")).as[Seq[String]].collect()
    assert(out.head == Seq("keep", "words"))
  }

  test("wordCount matches python len(s.split(' ')) semantics") {
    val data = Seq("a b  c", "", "one", " lead", "trail ")
    val out = data.toDF("text").select(wordCount($"text")).as[Int].collect().toSeq
    // python: "a b  c".split(" ")==['a','b','','c']; "".split(" ")==['']
    assert(out == Seq(4, 1, 1, 2, 2))
  }

  test("tokenCount counts alphanumeric runs") {
    val out = Seq("Hello, world! 42", "", "...", "a1b2")
      .toDF("text").select(tokenCount($"text")).as[Int].collect().toSeq
    assert(out == Seq(3, 0, 0, 1))
  }

  test("BPE-ish pattern segments contractions, capped digit runs, punct runs") {
    import org.apache.spark.sql.functions.{lit, regexp_extract_all}
    val pat = graft.queries.Text.BpePattern
    def seg(s: String): Seq[String] =
      Seq(s).toDF("text")
        .select(regexp_extract_all($"text", lit(pat), lit(0)))
        .as[Seq[String]].collect().head
    // contraction suffix splits off; 4-digit year splits 3+1 (cl100k cap)
    assert(seg("don't stop") == Seq("don", "'t", "stop"))
    assert(seg("in 2024!") == Seq("in", "202", "4", "!"))
    // punctuation runs group; apostrophe not starting a contraction
    // falls into the punct run
    assert(seg("well... 'quoted'") == Seq("well", "...", "'", "quoted", "'"))
  }

  test("fingerprint equals JVM md5 hex of utf8 bytes") {
    val texts = Seq("hello", "", "café 中文")
    val out = texts.toDF("text").select(fingerprint($"text")).as[String].collect().toSeq
    val md = java.security.MessageDigest.getInstance("MD5")
    val exp = texts.map { t =>
      md.digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString
    }
    assert(out == exp)
  }

  test("shingles produces sliding word n-grams; short inputs give empty") {
    def run(tokens: Seq[String], n: Int): Seq[String] =
      Seq(tokens).toDF("toks").select(shingles($"toks", n)).as[Seq[String]].collect().head
    assert(run(Seq("a", "b", "c", "d"), 3) == Seq("a b c", "b c d"))
    assert(run(Seq("a", "b", "c"), 3) == Seq("a b c"))
    assert(run(Seq("a", "b"), 3) == Seq.empty)
    assert(run(Seq.empty, 3) == Seq.empty)
  }

  test("shingles matches brute-force sliding window on random token lists") {
    val rng = new scala.util.Random(7)
    val lists = Seq.fill(50)(Seq.fill(rng.nextInt(10))("t" + rng.nextInt(5)))
    val out = lists.toDF("toks").select(shingles($"toks", 3)).as[Seq[String]].collect().toSeq
    val exp = lists.map(l => l.sliding(3).filter(_.size == 3).map(_.mkString(" ")).toSeq)
    assert(out == exp)
  }

  test("langId detects English and Spanish function words; gibberish is und") {
    val out = Seq(
      "the cat sat on the mat and it was happy",
      "el gato se sienta en la casa y es feliz",
      "zzz qqq xxx yyy")
      .toDF("text").select(langId($"text")).as[String].collect().toSeq
    assert(out == Seq("en", "es", "und"))
  }

  test("qualityScore is bounded in [0,1] and 0 for empty text") {
    val rng = new scala.util.Random(11)
    val inputs = "" +: Seq.fill(50)(
      (0 until rng.nextInt(200)).map(_ => "ab cde f ".charAt(rng.nextInt(9))).mkString)
    val out = inputs.toDF("text").select(qualityScore($"text")).as[Double].collect().toSeq
    assert(out.head == 0.0)
    assert(out.forall(v => v >= 0.0 && v <= 1.0))
  }

  test("qualityScore rewards normal prose over junk") {
    val prose = ("the quick brown fox jumps over the lazy dog and keeps running " * 10).trim
    val junk = "@@@@ #### %%%% ^^^^ &&&&"
    val out = Seq(prose, junk).toDF("text").select(qualityScore($"text")).as[Double].collect()
    assert(out(0) > out(1))
  }

  test("canonicalUrl: RFC 3986 normalization + tracking-param strip, idempotent") {
    def canon(urls: String*): Seq[String] =
      urls.toDF("u").select(canonicalUrl($"u")).as[String].collect().toSeq
    // the three messy shapes x3 synthesizes all collapse to one form
    assert(canon(
      "HTTPS://WWW.Example.COM:443/news/a/1/?utm_source=feed&b=2&a=1#frag",
      "https://www.example.com/news/a/1?a=1&b=2",
      "https://example.com/news/a/1?b=2&ref=home&a=1#x"
    ).distinct == Seq("https://example.com/news/a/1?a=1&b=2"))
    // authority lowercases; PATH AND QUERY CASE IS PRESERVED
    assert(canon("http://A.B/Path?X=Y") == Seq("http://a.b/Path?X=Y"))
    // default port is scheme-specific: http:443 and https:8443 are real
    assert(canon("http://x.com:80/a", "http://x.com:443/a",
      "https://x.com:8443/a") ==
      Seq("http://x.com/a", "http://x.com:443/a", "https://x.com:8443/a"))
    // all-tracking query drops the '?' entirely; fragment-only too
    assert(canon("https://x.com/a?utm_source=s&fbclid=1", "https://x.com/a#top",
      "https://x.com/a") == Seq("https://x.com/a", "https://x.com/a",
      "https://x.com/a"))
    // idempotence: canonical output is its own fixed point
    val messy = Seq(
      "HTTPS://WWW.Example.COM:443/news/a/1/?utm_source=feed&b=2&a=1#frag",
      "http://A.B:80/Path/?ref=r&z=26&y=25", "https://x.com/")
    val once = canon(messy: _*)
    assert(canon(once: _*) == once)
  }
}
