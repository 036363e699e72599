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

  test("date-partitioned appendUnique prunes the existing-keys read") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("partsink").toString + "/links"
    val day1 = Seq(("u1", "2022-08-27"), ("u2", "2022-08-27"), ("u3", "2022-08-28"))
      .toDF("url", "ingest_date")
    val day2 = Seq(("u3", "2022-08-28"), ("u4", "2022-08-29"), ("u5", "2022-08-29"))
      .toDF("url", "ingest_date")
    val n1 = sources.Sinks.appendUnique(spark, day1, tmp, "url", Some("ingest_date"))
    val n2 = sources.Sinks.appendUnique(spark, day2, tmp, "url", Some("ingest_date"))
    assert(n1 == 3 && n2 == 2, s"$n1/$n2") // u3 deduped across runs
    // hive-style partition directories on disk
    val dirs = new java.io.File(tmp).listFiles().map(_.getName).filter(_.startsWith("ingest_date="))
    assert(dirs.toSet == Set("ingest_date=2022-08-27", "ingest_date=2022-08-28",
      "ingest_date=2022-08-29"))
    // the anti-join's key read carries a partition filter and scans ONLY
    // the batch's partitions (1 of 3), never the whole key history
    val keys = sources.Sinks.existingKeys(spark, tmp, "url",
      Some("ingest_date"), Seq("2022-08-28"))
    keys.collect()
    val scan = keys.queryExecution.executedPlan.collectLeaves()
      .collectFirst { case f: org.apache.spark.sql.execution.FileSourceScanExec => f }
      .getOrElse(fail("no file scan in the existing-keys plan"))
    assert(scan.partitionFilters.nonEmpty, "partition filter missing")
    assert(scan.relation.location.inputFiles.length > 1, "fixture must span partitions")
    assert(scan.metrics("numFiles").value == 1,
      s"scan read ${scan.metrics("numFiles").value} files — pruning lost")
  }
}
