package graft.streaming

import graft.{Tables, TestSpark}
import graft.queries.Relational
import graft.functions.TextFunctions._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** The training-data filter chain (quality gate + stratified hash
  * sample) is pure row functions, so streaming it through micro-batches
  * must produce EXACTLY the batch answer — no watermark, no state. This
  * is the property that lets one codebase serve both the backfill and
  * the incremental ingest at 100 TB.
  */
class StreamFilterSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sfDir

  test("streamed quality+sample filter chain equals the batch result") {
    import spark.implicits._
    val docs = Tables.documents(spark, dir)
    val tmp = java.nio.file.Files.createTempDirectory("stream_filter").toString
    // several files → several micro-batches
    docs.repartition(4).write.parquet(s"$tmp/src")

    def chain(df: org.apache.spark.sql.DataFrame) = df
      .filter(Relational.stratifiedKeep(col("doc_id"), col("lang")))
      .select(col("doc_id"), col("lang"),
        qualityScore(col("text")).as("quality"))
      .filter(col("quality") >= 0.25)

    val q = chain(
      spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1).parquet(s"$tmp/src"))
      .writeStream.format("memory").queryName("filter_out")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    val streamed = spark.sql("SELECT doc_id, lang, quality FROM filter_out")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    val batch = chain(docs)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(streamed == batch)
    assert(batch.nonEmpty && batch.size < docs.count())
  }
}
