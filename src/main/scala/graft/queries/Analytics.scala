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
  * are rows-only for the oracle (the sentiment scalar is a custom UDF
  * with no DuckDB counterpart); SentimentSpec pins the scalar's exact
  * values and the trend's window algebra is oracle-covered by w1/w2.
  */
object Analytics {

  type Q = (SparkSession, String) => DataFrame

  /** A1: per-document sentiment struct (ipynb lines 262-263: two derived
    * columns). Map-only, one projection; the UDF breaks codegen locally
    * but the stage stays a single narrow pass.
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
  def a2SentimentTrend(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.documents(s, dir)
      .withColumn("day", date_add(to_date(lit("2022-01-01")), (col("doc_id") % 60).cast("int")))
      .withColumn("s", sentimentUdf(col("text")))
      .groupBy(col("day"))
      .agg(avg(col("s.polarity")).as("polarity"),
        avg(col("s.subjectivity")).as("subjectivity"))
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

  val queries: ListMap[String, Q] = ListMap(
    "a1_sentiment" -> (a1Sentiment _),
    "a2_sentiment_trend" -> (a2SentimentTrend _),
  )

  val oracle: ListMap[String, String] = ListMap.empty
}
