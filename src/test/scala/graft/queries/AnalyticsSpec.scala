package graft.queries

import graft.{Tables, TestSpark}
import graft.functions.Sentiment
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Driver-side brute-force parity for the sentiment slice (these queries
  * are rows-only at the oracle gate — the scalar is a custom UDF — so
  * the value-level check lives here).
  */
class AnalyticsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sfDir

  private def round6(v: Double): Double =
    BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("a1 per-doc sentiment equals direct scorer output") {
    val got = Analytics.a1Sentiment(spark, dir).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    val texts = Tables.documents(spark, dir).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got.length == texts.size)
    got.foreach { case (id, p, s) =>
      val (ep, es) = Sentiment.score(texts(id))
      assert(math.abs(p - round6(ep)) < 1e-9, s"doc $id polarity")
      assert(math.abs(s - round6(es)) < 1e-9, s"doc $id subjectivity")
    }
  }

  test("a2 trend equals brute-force daily means + rolling-10 with pandas nulls") {
    val rows = Analytics.a2SentimentTrend(spark, dir).collect()
      .map(r => (r.getDate(0).toString, r.getDouble(1), r.getDouble(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)),
        if (r.isNullAt(4)) None else Some(r.getDouble(4))))
    // brute force: same synthetic date assignment, driver-side means
    val docs = Tables.documents(spark, dir).select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val base = java.time.LocalDate.parse("2022-01-01")
    val byDay = docs.groupBy { case (id, _) => base.plusDays(id % 60) }
      .toSeq.sortBy(_._1.toString)
      .map { case (day, ds) =>
        val scores = ds.map { case (_, t) => Sentiment.score(t) }
        (day.toString,
          scores.map(_._1).sum / scores.size,
          scores.map(_._2).sum / scores.size)
      }
    assert(rows.map(_._1).toSeq == byDay.map(_._1))
    rows.zip(byDay).zipWithIndex.foreach { case (((_, p, s, rp, rs), (_, ep, es)), i) =>
      assert(math.abs(p - round6(ep)) < 1e-9, s"day $i polarity")
      assert(math.abs(s - round6(es)) < 1e-9, s"day $i subjectivity")
      if (i < 9) assert(rp.isEmpty && rs.isEmpty, s"day $i should be null (min_periods)")
      else {
        val wp = byDay.slice(i - 9, i + 1).map(_._2)
        val ws = byDay.slice(i - 9, i + 1).map(_._3)
        assert(math.abs(rp.get - round6(wp.sum / 10)) < 1e-6, s"day $i rolling polarity")
        assert(math.abs(rs.get - round6(ws.sum / 10)) < 1e-6, s"day $i rolling subjectivity")
      }
    }
  }
}
