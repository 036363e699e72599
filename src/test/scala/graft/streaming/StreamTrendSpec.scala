package graft.streaming

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** E3's trend, incrementally: the reference recomputes the daily
  * sentiment means on a 30-minute schedule; Structured Streaming states
  * the same daily tumbling aggregation once and emits each day when the
  * watermark proves it can no longer change. Closed windows from the
  * stream must equal the batch aggregation over the same rows — the w1
  * expression transfers to readStream unchanged.
  */
class StreamTrendSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("streamed daily tumbling means equal batch w1 for closed days") {
    val events = graft.Tables.events(spark, TestSpark.sfDir)
      .select(col("ts"), col("value"))
    // two time-ordered micro-batches + a far-future sentinel that closes
    // every real day
    val cut = events.orderBy(col("ts")).limit(events.count().toInt / 2)
      .agg(max(col("ts"))).head.getTimestamp(0)
    val maxTs = events.agg(max(col("ts"))).head.getTimestamp(0)
    val sentinel = Seq((new java.sql.Timestamp(
      maxTs.getTime + 10L * 86400000L), 0.0)).toDF("ts", "value")

    val dir = java.nio.file.Files.createTempDirectory("trend_src").toString
    var mtime = System.currentTimeMillis() - 60000L
    def writeOne(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory("trend_tmp").toString + "/o"
      df.coalesce(1).write.parquet(tmp)
      val f = new java.io.File(tmp).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      val dst = java.nio.file.Paths.get(dir, name)
      java.nio.file.Files.copy(f.toPath, dst)
      mtime += 10000L
      dst.toFile.setLastModified(mtime)
    }
    writeOne(events.filter(col("ts") <= cut), "part_00.parquet")
    writeOne(events.filter(col("ts") > cut), "part_01.parquet")
    writeOne(sentinel, "part_02.parquet")

    val q = spark.readStream.schema(sentinel.schema).parquet(dir)
      .withWatermark("ts", "0 seconds")
      .groupBy(window(col("ts"), "1 day").as("w"))
      .agg(round(avg(col("value")), 6).as("avg_value"),
        count(lit(1)).as("n"))
      .select(to_date(col("w.start")).as("day"), col("avg_value"), col("n"))
      .writeStream.format("memory").queryName("trend_out")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(180000)

    val got = spark.sql("SELECT * FROM trend_out")
      .collect().map(r => (r.getDate(0).toString, r.getDouble(1), r.getLong(2)))
      .toSet
    // batch w1 shape over the SAME rows; the sentinel's own day stays
    // open in the stream, so exclude it from the expectation
    val exp = events
      .groupBy(window(col("ts"), "1 day").as("w"))
      .agg(round(avg(col("value")), 6).as("avg_value"), count(lit(1)).as("n"))
      .select(to_date(col("w.start")).as("day"), col("avg_value"), col("n"))
      .collect().map(r => (r.getDate(0).toString, r.getDouble(1), r.getLong(2)))
      .toSet
    assert(got == exp, s"stream ${got.size} days vs batch ${exp.size} days")
  }
}
