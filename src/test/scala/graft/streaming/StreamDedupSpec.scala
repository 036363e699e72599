package graft.streaming

import graft.{Tables, TestSpark}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** Stream-vs-batch equivalence for the incremental dedup ingest
  * (O-W3/O-W4): the streamed, multi-micro-batch dropDuplicates output
  * must have exactly the batch-distinct key set — one row per key,
  * exactly once, across micro-batch boundaries.
  */
class StreamDedupSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("streamed dropDuplicates equals batch distinct keys across micro-batches") {
    val tmp = java.nio.file.Files.createTempDirectory("stream_src").toString
    // two overlapping micro-batch files: keys 0-99 then 50-149
    val events = Tables.events(spark, TestSpark.sfDir)
      .select(col("user_id"), col("event_id"), col("ts"))
    val part1 = events.filter(col("user_id") < 100)
    val part2 = events.filter(col("user_id") >= 50 && col("user_id") < 150)
    part1.coalesce(1).write.parquet(s"$tmp/f1")
    part2.coalesce(1).write.parquet(s"$tmp/f2")
    // flatten the two files into one source dir (order-stable names)
    val dir = java.nio.file.Files.createTempDirectory("stream_flat").toString
    var i = 0
    for (sub <- Seq("f1", "f2")) {
      val f = new java.io.File(s"$tmp/$sub").listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      java.nio.file.Files.copy(f.toPath,
        java.nio.file.Paths.get(dir, f"part_$i%02d.parquet"))
      i += 1
    }

    val schema = events.schema
    val q = StreamDedup.dedupStream(spark, dir, schema, "user_id", "ts")
      .writeStream
      .format("memory")
      .queryName("dedup_out")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    val got = spark.sql("SELECT user_id FROM dedup_out")
      .collect().map(_.getLong(0)).toSeq
    val expectedKeys = events.filter(col("user_id") < 150)
      .select(col("user_id")).distinct()
      .collect().map(_.getLong(0)).toSet
    assert(got.size == got.toSet.size, "a key was emitted more than once")
    assert(got.toSet == expectedKeys)
  }

  test("bounded dedup drops duplicates arriving within the watermark horizon") {
    import spark.implicits._
    val base = java.sql.Timestamp.valueOf("2024-06-01 12:00:00")
    def ts(minutes: Int) = new java.sql.Timestamp(base.getTime + minutes * 60000L)
    // batch 1: keys 1..5; batch 2: keys 3..8, all within an hour → every
    // duplicate is inside the 48h horizon and must be dropped
    val b1 = (1L to 5L).map(k => (k, ts(k.toInt)))
    val b2 = (3L to 8L).map(k => (k, ts(30 + k.toInt)))
    val dir = java.nio.file.Files.createTempDirectory("stream_wm").toString
    b1.toDF("key", "ts").coalesce(1).write.parquet(s"$dir/stage1")
    b2.toDF("key", "ts").coalesce(1).write.parquet(s"$dir/stage2")
    val src = java.nio.file.Files.createTempDirectory("stream_wm_flat").toString
    var i = 0
    for (st <- Seq("stage1", "stage2")) {
      val f = new java.io.File(s"$dir/$st").listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      java.nio.file.Files.copy(f.toPath,
        java.nio.file.Paths.get(src, f"part_$i%02d.parquet"))
      i += 1
    }
    val schema = b1.toDF("key", "ts").schema
    val q = StreamDedup.dedupStreamBounded(spark, src, schema, "key", "ts")
      .writeStream.format("memory").queryName("bounded_out")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val got = spark.sql("SELECT key FROM bounded_out").collect().map(_.getLong(0)).toSeq
    assert(got.size == got.toSet.size, "duplicate emitted inside horizon")
    assert(got.toSet == (1L to 8L).toSet)
  }

  test("streamed daily tumbling counts equal batch date_trunc counts (O-W1)") {
    val tmp = java.nio.file.Files.createTempDirectory("stream_w1").toString
    val events = graft.Tables.events(spark, graft.TestSpark.sfDir)
      .select(col("event_id"), col("ts"), col("value"))
    events.coalesce(2).write.parquet(s"$tmp/src")

    val q = spark.readStream
      .schema(events.schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$tmp/src")
      .withWatermark("ts", "1 day")
      .groupBy(window(col("ts"), "1 day"))
      .agg(count(lit(1)).as("n"), avg(col("value")).as("avg_value"))
      .writeStream
      .format("memory")
      .queryName("daily_out")
      .outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    val got = spark.sql("SELECT window.start, n, avg_value FROM daily_out")
      .collect()
      .map(r => (r.getTimestamp(0).toString, r.getLong(1), r.getDouble(2)))
      .sortBy(_._1)
    val exp = events
      .groupBy(date_trunc("day", col("ts")).as("day"))
      .agg(count(lit(1)).as("n"), avg(col("value")).as("avg_value"))
      .collect()
      .map(r => (r.getTimestamp(0).toString, r.getLong(1), r.getDouble(2)))
      .sortBy(_._1)
    assert(got.map(t => (t._1, t._2)).toSeq == exp.map(t => (t._1, t._2)).toSeq)
    got.zip(exp).foreach { case (g, e) => assert(math.abs(g._3 - e._3) < 1e-9) }
  }
}
