package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end incremental ingest: two overlapping runs append exactly
  * the delta, and the processed table matches applying the process
  * stage directly.
  */
class PipelineSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sfDir

  test("two overlapping ingest runs are incremental and exactly-once per key") {
    val tmp = java.nio.file.Files.createTempDirectory("pipeline").toString
    val links = s"$tmp/links"
    val articles = s"$tmp/articles"

    val firstHalf = (df: DataFrame) => df.filter(col("doc_id") < 300)
    val overlap = (df: DataFrame) => df.filter(col("doc_id") >= 150)

    val (l1, a1) = Pipeline.ingestRun(spark, dir, links, articles, firstHalf)
    assert(l1 > 0 && a1 > 0)
    val (l2, a2) = Pipeline.ingestRun(spark, dir, links, articles, overlap)

    // link keys are exactly-once across runs
    val storedLinks = spark.read.parquet(links)
    assert(storedLinks.count() == storedLinks.select("loc").distinct().count())
    assert(storedLinks.count() == l1 + l2)

    // articles: exactly-once per doc_id, and the union of both runs
    val stored = spark.read.parquet(articles)
    assert(stored.count() == stored.select("doc_id").distinct().count())
    assert(stored.count() == a1 + a2)

    // content equals applying the process stage to the full doc range
    val expected = Pipeline.processArticles(Tables.documents(spark, dir))
    assert(stored.count() == expected.count())
    val got = stored.select("doc_id", "n_words_clean", "polarity")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).toSet
    val exp = expected.select("doc_id", "n_words_clean", "polarity")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).toSet
    assert(got == exp)
  }
}
