package graft.streaming

import graft.TestSpark
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** Streaming sessionization (flatMapGroupsWithState) vs hand-computed
  * gap sessions: eager closes on in-stream gaps, timeout closes once
  * the watermark passes last+gap, open sessions withheld.
  */
class StreamSessionsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("streamed sessions equal batch gap-sessionization for closed sessions") {
    val base = java.sql.Timestamp.valueOf("2024-06-01 08:00:00")
    def ts(minutes: Long) = new java.sql.Timestamp(base.getTime + minutes * 60000L)
    // user 1: two sessions (0,10,20 | 120,125); user 2: one session (5,15)
    val batch1 = Seq((1L, ts(0)), (1L, ts(10)), (1L, ts(20)),
      (1L, ts(120)), (1L, ts(125)), (2L, ts(5)), (2L, ts(15)))
      .toDF("user_id", "ts")
    // sentinel: a far-future event advances the watermark past every
    // last+gap above, timing the open sessions out
    val batch2 = Seq((999L, ts(60L * 24 * 10))).toDF("user_id", "ts")

    val dir = java.nio.file.Files.createTempDirectory("sess_src").toString
    def writeOne(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory("sess_tmp").toString + "/out"
      df.coalesce(1).write.parquet(tmp)
      val f = new java.io.File(tmp).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      java.nio.file.Files.copy(f.toPath, java.nio.file.Paths.get(dir, name))
    }
    writeOne(batch1, "part_00.parquet")
    writeOne(batch2, "part_01.parquet")

    val q = StreamSessions.sessionize(spark, dir, batch1.schema)
      .writeStream.format("memory").queryName("sess_out")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    val got = spark.sql("SELECT user_id, n_events, span_us FROM sess_out")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // hand-computed 30-min-gap sessions over batch1 (all closed by the
    // sentinel); 999's own session stays open → withheld
    val expected = Set(
      (1L, 3L, 20L * 60000000L), // 0,10,20
      (1L, 2L, 5L * 60000000L),  // 120,125
      (2L, 2L, 10L * 60000000L)) // 5,15
    assert(got == expected, s"got $got")
  }

  test("native session_window streams: closed sessions equal batch w8") {
    import org.apache.spark.sql.functions._
    // the same fixture batches as the flatMapGroupsWithState test, run
    // through the BUILT-IN session_window aggregate under a watermark —
    // w8's docstring claims the batch expression transfers unchanged;
    // this pins it
    val base = java.sql.Timestamp.valueOf("2024-06-01 08:00:00")
    def ts(minutes: Long) = new java.sql.Timestamp(base.getTime + minutes * 60000L)
    val batch1 = Seq((1L, ts(0)), (1L, ts(10)), (1L, ts(20)),
      (1L, ts(120)), (1L, ts(125)), (2L, ts(5)), (2L, ts(15)))
      .toDF("user_id", "ts")
    val batch2 = Seq((999L, ts(60L * 24 * 10))).toDF("user_id", "ts")

    val dir = java.nio.file.Files.createTempDirectory("sw_src").toString
    def writeOne(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory("sw_tmp").toString + "/out"
      df.coalesce(1).write.parquet(tmp)
      val f = new java.io.File(tmp).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      java.nio.file.Files.copy(f.toPath, java.nio.file.Paths.get(dir, name))
    }
    writeOne(batch1, "part_00.parquet")
    writeOne(batch2, "part_01.parquet")

    val q = spark.readStream.schema(batch1.schema).parquet(dir)
      .withWatermark("ts", "0 seconds")
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("sw"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        unix_micros(col("sw.start")).as("start_us"),
        unix_micros(col("sw.end")).as("end_us"),
        col("n_events"))
      .writeStream.format("memory").queryName("sw_out")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    val got = spark.sql("SELECT * FROM sw_out")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    // batch w8 over the SAME rows, minus the sentinel's own still-open
    // session (append mode withholds windows the watermark hasn't passed)
    val batchAll = batch1.union(batch2)
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("sw"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        unix_micros(col("sw.start")).as("start_us"),
        unix_micros(col("sw.end")).as("end_us"),
        col("n_events"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .filter(_._1 != 999L).toSet
    assert(got == batchAll, s"stream $got vs batch $batchAll")
  }

  test("native session_window merges out-of-order late arrivals; beyond-watermark events drop") {
    import org.apache.spark.sql.functions._
    // w8's streaming claim under a DISORDERED feed: batch 0 leaves user 1
    // with two separate sessions (0 | 40) and user 2 with (15); batch 1
    // arrives LATE but inside the 2-hour watermark — ts(20) must bridge
    // user 1's sessions into one, ts(5) must extend user 2's session
    // START backwards; the sentinel closes everything; a final event far
    // BEHIND the advanced watermark must be discarded, not mis-merged.
    val base = java.sql.Timestamp.valueOf("2024-06-01 08:00:00")
    def ts(minutes: Long) = new java.sql.Timestamp(base.getTime + minutes * 60000L)
    def us(minutes: Long) = (base.getTime + minutes * 60000L) * 1000L
    val b0 = Seq((1L, ts(0)), (1L, ts(40)), (2L, ts(15))).toDF("user_id", "ts")
    val b1 = Seq((1L, ts(20)), (2L, ts(5))).toDF("user_id", "ts")
    val b2 = Seq((999L, ts(60L * 24 * 10))).toDF("user_id", "ts")
    // the late-event filter runs one batch BEHIND eviction (Spark's
    // two-phase watermark: this batch's filter uses the PREVIOUS batch's
    // value, so a row racing the watermark update isn't dropped) — a
    // spacer batch lets the sentinel's watermark reach the filter before
    // the straggler arrives
    val b2b = Seq((999L, ts(60L * 24 * 10 + 1))).toDF("user_id", "ts")
    val b3 = Seq((3L, ts(10))).toDF("user_id", "ts") // 10 days behind the watermark

    val dir = java.nio.file.Files.createTempDirectory("sw_late_src").toString
    // the file source serves files in modification-time order — pin
    // strictly increasing mtimes so "arrival order" is deterministic
    var mtime = System.currentTimeMillis() - 60000L
    def writeOne(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory("sw_late_tmp").toString + "/out"
      df.coalesce(1).write.parquet(tmp)
      val f = new java.io.File(tmp).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      val dst = java.nio.file.Paths.get(dir, name)
      java.nio.file.Files.copy(f.toPath, dst)
      mtime += 10000L
      dst.toFile.setLastModified(mtime)
    }
    writeOne(b0, "part_00.parquet")
    writeOne(b1, "part_01.parquet")
    writeOne(b2, "part_02.parquet")
    writeOne(b2b, "part_03.parquet")
    writeOne(b3, "part_04.parquet")

    val q = spark.readStream.schema(b0.schema)
      .option("maxFilesPerTrigger", "1") // one file per micro-batch, in order
      .parquet(dir)
      .withWatermark("ts", "2 hours")
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("sw"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        unix_micros(col("sw.start")).as("start_us"),
        unix_micros(col("sw.end")).as("end_us"),
        col("n_events"))
      .writeStream.format("memory").queryName("sw_late_out")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    val got = spark.sql("SELECT * FROM sw_late_out")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    // hand-computed closed sessions: the cross-batch merges happened, the
    // behind-watermark user-3 event left no trace, 999's session is open
    val expected = Set(
      (1L, us(0), us(40 + 30), 3L), // 0 | 40 bridged by late 20
      (2L, us(5), us(15 + 30), 2L)) // 15 extended backwards by late 5
    assert(got == expected, s"got $got")
    // and the stream equals batch w8 over exactly the non-dropped rows
    val batchEq = b0.union(b1)
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("sw"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        unix_micros(col("sw.start")).as("start_us"),
        unix_micros(col("sw.end")).as("end_us"),
        col("n_events"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == batchEq, s"stream $got vs batch $batchEq")
  }

  test("streamed sessions over the events fixture equal batch q21") {
    import org.apache.spark.sql.functions._
    val events = graft.Tables.events(spark, TestSpark.sfDir)
      .select(col("user_id"), col("ts"))
    // split into two time-ordered micro-batches + a watermark sentinel
    val cut = events.orderBy(col("ts")).limit(events.count().toInt / 2)
      .agg(max(col("ts"))).head.getTimestamp(0)
    val maxTs = events.agg(max(col("ts"))).head.getTimestamp(0)
    val sentinel = Seq((999999L,
      new java.sql.Timestamp(maxTs.getTime + 10L * 86400000L))).toDF("user_id", "ts")

    val dir = java.nio.file.Files.createTempDirectory("sess_ev").toString
    def writeOne(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory("sess_ev_tmp").toString + "/o"
      df.coalesce(1).write.parquet(tmp)
      val f = new java.io.File(tmp).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      java.nio.file.Files.copy(f.toPath, java.nio.file.Paths.get(dir, name))
    }
    writeOne(events.filter(col("ts") <= cut), "part_00.parquet")
    writeOne(events.filter(col("ts") > cut), "part_01.parquet")
    writeOne(sentinel, "part_02.parquet")

    val q = StreamSessions.sessionize(spark, dir, sentinel.schema)
      .writeStream.format("memory").queryName("sess_ev_out")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(180000)

    def multiset(rows: Array[(Long, Long, Long)]) =
      rows.groupBy(identity).view.mapValues(_.length).toMap
    val got = multiset(spark.sql(
      "SELECT user_id, n_events, span_us FROM sess_ev_out WHERE user_id < 999999")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))))
    val exp = multiset(graft.queries.Relational
      .q21Sessionize(spark, TestSpark.sfDir)
      .select(col("user_id"), col("n_events"), col("span_us"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))))
    assert(got == exp)
  }
}
