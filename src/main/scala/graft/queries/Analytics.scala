package graft.queries

import graft.Tables
import graft.functions.Sentiment.sentimentUdf
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import scala.collection.immutable.ListMap

/** Sentiment analytics over `documents` — the reference's E3 entry point
  * (notebooks/sentiment_analysis.ipynb): per-document polarity +
  * subjectivity, then the daily-mean + rolling-mean trend. Both queries
  * are FULLY value-checked: the sentiment scalar's algebra (lexicon
  * mean, intensifier scaling, two-token negation window) is re-expressed
  * in DuckDB list lambdas with the lexicon as map literals generated
  * from the same TSV the UDF loads — `list_reduce` keeps the double
  * summation in token order, so scores match the JVM bit-for-bit
  * (validated per-row on the sf0.01 dump before wiring). SentimentSpec
  * additionally pins scalar unit pairs.
  */
object Analytics {

  type Q = (SparkSession, String) => DataFrame

  private def sq(w: String): String = "'" + w.replace("'", "''") + "'"

  /** The lexicon as three DuckDB map literals (word → polarity /
    * subjectivity / intensity), generated from the runtime lexicon so
    * the oracle can never drift from the UDF's table.
    */
  private lazy val lexCte: String = {
    val entries = graft.functions.Sentiment.lexicon.toSeq.sortBy(_._1)
    val words = entries.map(e => sq(e._1)).mkString("[", ", ", "]")
    def dl(f: graft.functions.Sentiment.Entry => Double) =
      entries.map(e => f(e._2).toString + "::DOUBLE").mkString("[", ", ", "]")
    s"""lex AS (
       |  SELECT map($words, ${dl(_.polarity)}) AS pol,
       |         map($words, ${dl(_.subjectivity)}) AS subj,
       |         map($words, ${dl(_.intensity)}) AS inten
       |)""".stripMargin
  }

  private lazy val negList: String =
    graft.functions.Sentiment.negators.toSeq.sorted.map(sq).mkString("[", ", ", "]")

  private def isNeg(t: String): String =
    s"(list_contains($negList, $t) OR $t LIKE '%n''t')"

  /** Per-document unrounded (p, s) scores — the SQL twin of
    * Sentiment.score: map lookups index the token list 1-based; a
    * modifier directly before a lexicon word is consumed; negation within
    * two tokens multiplies polarity by -0.5 after intensity clamping.
    */
  private lazy val scoresCte: String =
    s"""WITH $lexCte, tok AS (
       |  SELECT doc_id,
       |    list_filter(string_split_regex(lower(text), '[^a-z0-9'']+'), t -> t <> '') AS ts
       |  FROM documents
       |), contrib AS (
       |  SELECT doc_id,
       |    list_filter(
       |      list_transform(range(1, len(ts)+1), i ->
       |        CASE
       |          WHEN pol[ts[i]][1] IS NULL THEN NULL
       |          WHEN inten[ts[i]][1] != 1.0 AND i < len(ts) AND pol[ts[i+1]][1] IS NOT NULL THEN NULL
       |          ELSE struct_pack(
       |            p := (CASE WHEN (i > 1 AND ${isNeg("ts[i-1]")}) OR (i > 2 AND ${isNeg("ts[i-2]")})
       |                       THEN -0.5::DOUBLE ELSE 1.0::DOUBLE END)
       |                 * (CASE WHEN i > 1 AND inten[ts[i-1]][1] IS NOT NULL AND inten[ts[i-1]][1] != 1.0
       |                         THEN greatest(-1.0::DOUBLE, least(1.0::DOUBLE, pol[ts[i]][1] * inten[ts[i-1]][1]))
       |                         ELSE pol[ts[i]][1] END),
       |            s := (CASE WHEN i > 1 AND inten[ts[i-1]][1] IS NOT NULL AND inten[ts[i-1]][1] != 1.0
       |                       THEN greatest(0.0::DOUBLE, least(1.0::DOUBLE, subj[ts[i]][1] * inten[ts[i-1]][1]))
       |                       ELSE subj[ts[i]][1] END))
       |        END),
       |      c -> c IS NOT NULL) AS kept
       |  FROM tok, lex
       |), scores AS (
       |  SELECT doc_id,
       |    CASE WHEN len(kept) = 0 THEN 0.0::DOUBLE
       |         ELSE list_reduce(list_transform(kept, c -> c.p), (a,x) -> a + x) / len(kept) END AS p,
       |    CASE WHEN len(kept) = 0 THEN 0.0::DOUBLE
       |         ELSE list_reduce(list_transform(kept, c -> c.s), (a,x) -> a + x) / len(kept) END AS s
       |  FROM contrib
       |)""".stripMargin

  /** A1: per-document sentiment struct (ipynb lines 262-263: two derived
    * columns). Map-only, one projection; the UDF breaks codegen locally
    * but the stage stays a single narrow pass.
    *
    * Perf note (round-8 isolation of the r7 "a1 0.81→1.55 s" flag):
    * isolated bench runs at sf0.1 put a1 at 2.2 s against 2.0–2.6 s for
    * t9_token_count — a plain codegen'd token count over the SAME text
    * column — so the query is parquet-text-scan-bound and the scorer UDF
    * adds ≲0.2 s. The r6→r7 delta was suite-context noise (this VM swings
    * the same query 2 s↔15 s run-to-run); promoting the scorer to a
    * codegen Expression would not move the number, so the UDF stays.
    */
  def a1Sentiment(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .withColumn("s", sentimentUdf(col("text")))
      .select(col("doc_id"),
        round(col("s.polarity"), 6).as("polarity"),
        round(col("s.subjectivity"), 6).as("subjectivity"))
      .orderBy(col("doc_id"))

  /** A2: the sentiment trend (E3): per-doc sentiment → attach a
    * deterministic synthetic date (the fixture has no date column) →
    * daily mean (O-W1/O-A2) → 10-day trailing rolling mean with pandas
    * null semantics (O-W2). The rolling window is a single-partition
    * window over the POST-aggregation daily frame (cardinality = #days)
    * — safe at any input scale.
    */
  def a2SentimentTrend(s: SparkSession, dir: String): DataFrame =
    sentimentTrendOf(Tables.documents(s, dir)
      .withColumn("day", date_add(to_date(lit("2022-01-01")), (col("doc_id") % 60).cast("int")))
      .withColumn("s", sentimentUdf(col("text")))
      .select(col("day"), col("s.polarity").as("polarity"),
        col("s.subjectivity").as("subjectivity")))

  /** The E3 trend core over ANY per-document (day DATE, polarity,
    * subjectivity) frame: daily mean → 10-day trailing rolling mean
    * with pandas null semantics. Factored out of [[a2SentimentTrend]]
    * so the synthetic-fixture query and the golden-CSV replay
    * (BbcCorpusSpec driving the reference's committed 20,350-row
    * articles_sentiments.csv through it) run the SAME code path.
    */
  def sentimentTrendOf(scored: DataFrame): DataFrame = {
    val daily = scored
      .groupBy(col("day"))
      .agg(avg(col("polarity")).as("polarity"),
        avg(col("subjectivity")).as("subjectivity"))
    val w = Window.orderBy(col("day")).rowsBetween(-9, 0)
    def rolling(c: Column) = // pandas rolling(10): first 9 rows null
      when(count(lit(1)).over(w) < 10, lit(null))
        .otherwise(round(avg(c).over(w), 6))
    daily
      .withColumn("rolling_polarity", rolling(col("polarity")))
      .withColumn("rolling_subjectivity", rolling(col("subjectivity")))
      .select(col("day"), round(col("polarity"), 6).as("polarity"),
        round(col("subjectivity"), 6).as("subjectivity"),
        col("rolling_polarity"), col("rolling_subjectivity"))
      .orderBy(col("day"))
  }

  lazy val a1Sql: String =
    scoresCte +
      """
        |SELECT doc_id, round(p, 6) AS polarity, round(s, 6) AS subjectivity
        |FROM scores ORDER BY doc_id""".stripMargin

  lazy val a2Sql: String =
    scoresCte +
      """
        |, daily AS (
        |  SELECT DATE '2022-01-01' + INTERVAL ((doc_id % 60)) DAY AS day,
        |         avg(p) AS polarity, avg(s) AS subjectivity
        |  FROM scores GROUP BY 1
        |)
        |SELECT CAST(day AS DATE) AS day, round(polarity, 6) AS polarity,
        |  round(subjectivity, 6) AS subjectivity,
        |  CASE WHEN count(*) OVER w < 10 THEN NULL
        |       ELSE round(avg(polarity) OVER w, 6) END AS rolling_polarity,
        |  CASE WHEN count(*) OVER w < 10 THEN NULL
        |       ELSE round(avg(subjectivity) OVER w, 6) END AS rolling_subjectivity
        |FROM daily
        |WINDOW w AS (ORDER BY day ROWS BETWEEN 9 PRECEDING AND CURRENT ROW)
        |ORDER BY day""".stripMargin

  val queries: ListMap[String, Q] = ListMap(
    "a1_sentiment" -> (a1Sentiment _),
    "a2_sentiment_trend" -> (a2SentimentTrend _),
  )

  lazy val oracle: ListMap[String, String] = ListMap(
    "a1_sentiment" -> a1Sql,
    "a2_sentiment_trend" -> a2Sql,
  )
}
