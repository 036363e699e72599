package graft.streaming

import graft.TestSpark
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** Stream-stream interval join (click→purchase attribution) vs the
  * batch range join over the same events: in-band pairs match exactly,
  * out-of-band purchases never surface.
  */
class StreamJoinSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val base = java.sql.Timestamp.valueOf("2024-06-01 08:00:00")
  private def ts(minutes: Long) = new java.sql.Timestamp(base.getTime + minutes * 60000L)

  test("streamed attribution equals the batch range join") {
    // user 1: click@0 → purchases @30 (in band) and @90 (out of band);
    // a second click@70 catches the @90 purchase. user 2: purchase with
    // NO prior click (never attributed). user 3: click only (no output).
    val rows = Seq(
      (100L, ts(0), 1L, "click", 0.0),
      (101L, ts(30), 1L, "purchase", 9.99),
      (102L, ts(70), 1L, "click", 0.0),
      (103L, ts(90), 1L, "purchase", 5.0),
      (200L, ts(10), 2L, "purchase", 3.0),
      (300L, ts(20), 3L, "click", 0.0))
    val batch1 = rows.toDF("event_id", "ts", "user_id", "event_type", "value")
    // sentinel clicks+purchases far in the future push the watermark
    // past every band above so all in-band pairs emit
    val batch2 = Seq(
      (900L, ts(60L * 24 * 10), 9L, "click", 0.0),
      (901L, ts(60L * 24 * 10 + 1), 9L, "purchase", 1.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")

    val dir = java.nio.file.Files.createTempDirectory("sj_src").toString
    def writeOne(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory("sj_tmp").toString + "/out"
      df.coalesce(1).write.parquet(tmp)
      val f = new java.io.File(tmp).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      java.nio.file.Files.copy(f.toPath, java.nio.file.Paths.get(dir, name))
    }
    writeOne(batch1, "part_00.parquet")
    writeOne(batch2, "part_01.parquet")

    val q = StreamJoin.attribute(spark, dir, batch1.schema)
      .writeStream.format("memory").queryName("sj_out")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    def key(r: org.apache.spark.sql.Row) = (r.getLong(0), r.getLong(1), r.getLong(2))
    val got = spark.sql("SELECT user_id, click_id, buy_id FROM sj_out")
      .collect().map(key).toSet
    val all = batch1.unionByName(batch2)
    val expected = StreamJoin.attributeBatch(all)
      .select("user_id", "click_id", "buy_id").collect().map(key).toSet

    assert(expected === Set((1L, 100L, 101L), (1L, 102L, 103L), (9L, 900L, 901L)))
    assert(got === expected)
  }

  test("band boundary: a purchase exactly at click_ts + horizon still joins") {
    val events = Seq(
      (1L, ts(0), 7L, "click", 0.0),
      (2L, ts(60), 7L, "purchase", 1.0), // exactly 1 hour later
      (3L, ts(61), 7L, "purchase", 1.0)) // one minute past the band
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val got = StreamJoin.attributeBatch(events)
      .select("click_id", "buy_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((1L, 2L)))
  }
}
